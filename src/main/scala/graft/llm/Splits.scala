package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the train/val/test assignment of a
  * training-data pipeline. Hash-based (not random): the split is a PURE
  * FUNCTION of the document id, so it is stable across runs, machines, and
  * engines, and any subset of the corpus reproduces the same assignment —
  * the property that matters when 100 TB is reprocessed incrementally.
  * Portable md5-prefix hash (not xxhash) so external systems can replay
  * the exact assignment. */
object Splits {

  /** Stable bucket in [0, buckets) from the id's md5 prefix (16 bits). */
  def splitBucket(id: Column, buckets: Int = 100): Column =
    pmod(conv(substring(md5(id.cast("string")), 1, 4), 16, 10).cast("long"),
      lit(buckets.toLong))

  /** train/val/test label: first `trainPct` buckets are train, next
    * `valPct` are val, the rest test. */
  def assignSplit(id: Column, trainPct: Int = 80, valPct: Int = 10): Column = {
    val b = splitBucket(id)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }
}
