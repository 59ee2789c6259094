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

  /** SCD type-2 history build: every non-delete change becomes a
    * version row with a validity range [valid_from, valid_to) on the
    * version axis — valid_to is the NEXT change's version (a delete
    * closes the prior version without emitting a row), null marks the
    * current version. One partitioned window per key; version ties
    * (possible when the changelog source has duplicate sequence
    * numbers) are ordered by the same (seq, op, payload...) total order
    * [[applyChangelog]] uses, so both builds agree on history. */
  def scd2History(changes: DataFrame, key: String, seqCol: String,
                  opCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val payload = changes.columns
      .filterNot(Set(key, seqCol, opCol)).toSeq
    val w = Window.partitionBy(col(key))
      .orderBy((col(seqCol) +: col(opCol) +: payload.map(col))
        .map(_.asc): _*)
    changes
      .withColumn("valid_to", lead(col(seqCol), 1).over(w))
      .filter(col(opCol) =!= "D")
      .select(col(key) +: payload.map(col) :+
        col(seqCol).as("valid_from") :+ col("valid_to") :+
        col("valid_to").isNull.as("is_current"): _*)
  }

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
    // structs orders by seq first — no window, combiner-friendly.
    // Persisted (QueryCache-scoped): the winner frame feeds BOTH the
    // anti-join key side and the upsert side — unpersisted, the
    // changelog would be scanned and aggregated twice.
    val winner = graft.util.QueryCache.persist(changes
      .groupBy(col(key))
      .agg(max(struct((col(seqCol) +: col(opCol) +: payload.map(col))
        : _*)).as("__w"))
      .select(col(key) +: col(s"__w.$opCol").as("__op") +:
        payload.map(c => col(s"__w.$c").as(c)): _*))
    val upserts = winner.filter(col("__op") =!= "D").drop("__op")
    val touched = winner.select(col(key))
    snapshot.join(touched, Seq(key), "left_anti")
      .unionByName(upserts.select(snapshot.columns.map(col): _*))
  }
}
