package graft.io

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Small-file compaction planning — the table-maintenance verb behind
  * Delta/Iceberg OPTIMIZE: given per-segment sizes (a METADATA frame —
  * one row per file/segment, bounded by the file listing, never by
  * data), assign key-ordered segments to compaction batches of
  * ~targetBytes by cutting the running total at target boundaries:
  *
  *   batch(f) = (Σ bytes of segments before f) div targetBytes
  *
  * Pure integer arithmetic, key-locality-preserving (consecutive
  * segments land in the same batch, so the rewrite keeps clustering),
  * and deterministic for any engine to replay. The prefix sum runs over
  * the segment-metadata frame only — the classic Delta OPTIMIZE shape
  * where planning is metadata-sized and the heavy rewrite is the
  * (separate, embarrassingly parallel) execution. */
object Compaction {

  /** @param segments one row per segment
    * @param key      ordering key (clustering order to preserve)
    * @param bytes    integer byte-size column
    * @return (key, bytes, batch, batch_bytes, batch_segments) ordered
    *         plan with per-batch totals joined back on the batch id. */
  def plan(segments: DataFrame, key: String, bytes: Column,
           targetBytes: Long): DataFrame = {
    require(targetBytes > 0, s"targetBytes must be positive: $targetBytes")
    val w = Window.orderBy(col(key))
      .rowsBetween(Window.unboundedPreceding, -1)
    val withBatch = segments
      .select(col(key), bytes.cast("long").as("bytes"))
      .withColumn("__cum", coalesce(sum(col("bytes")).over(w), lit(0L)))
      // integer div, not `/` — float quotients drop bytes past 2^53
      .withColumn("batch", expr(s"__cum div ${targetBytes}L"))
      .drop("__cum")
    val planned = graft.util.QueryCache.persist(withBatch)
    val totals = planned.groupBy(col("batch"))
      .agg(sum(col("bytes")).as("batch_bytes"),
        count(lit(1)).as("batch_segments"))
    planned.join(totals, "batch")
      .select(col(key), col("bytes"), col("batch"), col("batch_bytes"),
        col("batch_segments"))
  }
}
