package graft.window

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Cohort retention — the companion report to [[Funnel]]: entities
  * cohorted by the DAY of their first `anchor` event, then for every
  * week offset the share still active (any event). All integer/date
  * arithmetic (counts, day diffs, exact-ppm shares) — no floats, no
  * windows; two wordcount-shaped aggregations and one broadcast-sized
  * join on the cohort key. */
object Cohort {

  /** @return one row per (cohort_day, week_offset) with the cohort size,
    *         active-entity count, and exact-ppm retention share.
    *         Activity strictly BEFORE the anchor is ignored (offset >= 0
    *         only); week 0 is the anchor week, so its retention is
    *         1e6 ppm by construction. */
  def weeklyRetention(events: DataFrame, entity: String, ts: String,
                      typeCol: String, anchor: String): DataFrame = {
    val first = events.filter(col(typeCol) === anchor)
      .groupBy(col(entity))
      .agg(to_date(min(col(ts))).as("cohort_day"))
    val sizes = first.groupBy(col("cohort_day"))
      .agg(count(lit(1)).as("n_cohort"))
    val active = events.select(col(entity), to_date(col(ts)).as("__d"))
      .join(first, Seq(entity))
      // filter BEFORE the div: `div` truncates toward zero, so a -3-day
      // (pre-anchor) diff would otherwise alias into week 0
      .withColumn("__dd", datediff(col("__d"), col("cohort_day")))
      .filter(col("__dd") >= 0)
      .withColumn("week_offset", expr("__dd div 7"))
      .select(col(entity), col("cohort_day"), col("week_offset"))
      .distinct()
      .groupBy(col("cohort_day"), col("week_offset"))
      .agg(count(lit(1)).as("n_active"))
    active.join(sizes, Seq("cohort_day"))
      .select(col("cohort_day"), col("week_offset"), col("n_cohort"),
        col("n_active"),
        expr("n_active * 1000000 div n_cohort").as("retained_ppm"))
  }
}
