package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Changelog application (CDC apply / MERGE INTO): fold a stream of
  * keyed insert/update/delete change records into a base snapshot —
  * the table-maintenance verb every incrementally-refreshed corpus
  * snapshot needs (the batch core of Delta/Iceberg MERGE, expressed as
  * plain relational algebra so Catalyst plans it).
  *
  * Semantics: per key, the change record with the highest `seqCol`
  * wins ('last writer wins'); a winning delete removes the key, a
  * winning insert/update replaces (or creates) the row; untouched
  * snapshot keys pass through.
  *
  * Scale shape: one hash aggregate collapses the changelog to its
  * per-key winner (map-side combine — the changelog never reaches the
  * join at full multiplicity), then ONE left-anti join on the key plus
  * a union. Both sides shuffle on the key once; AQE broadcasts the
  * collapsed changelog when it is small. No windows, no row
  * multiplication.
  */
object ChangelogMerge {

  /** @param snapshot base table; `key` unique
    * @param changes  changelog carrying `key`, `seqCol` (version — ties
    *                 broken by the max full record, so make seq unique
    *                 per key upstream for deterministic results),
    *                 `opCol` ('I'/'U'/'D'), and the snapshot's payload
    *                 columns for non-delete ops
    * @return the merged snapshot, schema = snapshot's columns */
  def applyChangelog(snapshot: DataFrame, changes: DataFrame,
                     key: String, seqCol: String, opCol: String)
      : DataFrame = {
    val payload = snapshot.columns.filter(_ != key)
    // per-key winner in ONE aggregate: max over (seq, op, payload...)
    // structs orders by seq first — no window, combiner-friendly
    val winner = changes
      .groupBy(col(key))
      .agg(max(struct((col(seqCol) +: col(opCol) +: payload.map(col))
        : _*)).as("__w"))
      .select(col(key) +: col(s"__w.$opCol").as("__op") +:
        payload.map(c => col(s"__w.$c").as(c)): _*)
    val upserts = winner.filter(col("__op") =!= "D").drop("__op")
    val touched = winner.select(col(key))
    snapshot.join(touched, Seq(key), "left_anti")
      .unionByName(upserts.select(snapshot.columns.map(col): _*))
  }
}
