package graft.align

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Batch point-in-interval join — the offline counterpart of the
  * streaming interval join (q127/q208): assign each timestamped point to
  * the interval(s) of its group that contain it.
  *
  * A naive `t BETWEEN start AND end` join is a BroadcastNestedLoopJoin —
  * quadratic per group, the classic range-join scale killer. This runs
  * the time-BUCKET decomposition instead: both sides key by
  * `unix_micros div bucketMicros`, an interval spanning k buckets emits
  * k rows (`sequence()`, bounded by interval length / bucket width), the
  * join becomes a pure EQUI-join on (group, bucket) that Catalyst hashes
  * or sort-merges, and one containment predicate refines the candidates.
  * Every matched (point, interval) pair appears exactly once (a point
  * lives in exactly one bucket). */
object IntervalJoin {

  /** @param points    (by..., t, ...) — t a timestamp column name
    * @param intervals (by..., start, end, payload...) with start <= end
    * @param bucketMicros bucket width; pick ≈ the typical interval
    *                  length so intervals span O(1) buckets
    * @return points joined with the payload of every containing interval
    *         (inclusive bounds), inner semantics. */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
                      by: Seq[String], t: String, start: String,
                      end: String, bucketMicros: Long): DataFrame = {
    require(bucketMicros > 0, s"bucket width must be positive")
    val pts = points.withColumn("__bkt",
      expr(s"unix_micros($t) div $bucketMicros"))
    val ivs = intervals
      .withColumn("__bkt", explode(sequence(
        expr(s"unix_micros($start) div $bucketMicros"),
        expr(s"unix_micros($end) div $bucketMicros"))))
    pts.join(ivs, by :+ "__bkt")
      .filter(col(t) >= col(start) && col(t) <= col(end))
      .drop("__bkt")
  }
}
