package graft.numerics

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Kaplan–Meier product-limit survival + Nelson–Aalen cumulative hazard
  * (Kaplan & Meier 1958; the censoring-aware lifetime verbs the reference
  * leaves to lifelines/scikit-survival — here as first-class relational
  * operators, ref `core/_aggregations.py` family for the reduction
  * framing).
  *
  * Input: one row per SUBJECT with an integer duration and an event flag
  * (1 = event observed, 0 = right-censored). The estimator runs on the
  * per-distinct-duration aggregate — d_t (events) and c_t (censorings)
  * per time — so the sequential part touches one row per DISTINCT
  * duration (calendar-bounded), never one per subject.
  *
  *   n_t = N − Σ_{u<t} (d_u + c_u)            (at-risk; censored-at-t
  *                                             still at risk at t)
  *   S_t = S_{t−1} · (n_t − d_t) / n_t        (Kaplan–Meier)
  *   H_t = H_{t−1} + d_t / n_t                (Nelson–Aalen)
  *
  * Exactness contract (the q276 Holt convention): both recursions run in
  * INTEGER fixed-point on the 1e12 grid with truncating division —
  * S_e ← (S_e·(n−d)) div n and H_e ← H_e + (d·1e12) div n — computed in
  * BigInteger so no intermediate ever overflows regardless of cohort
  * size; DuckDB replays bit-for-bit with HUGEINT `//`. No float exists
  * anywhere in the estimator.
  *
  * Distributed shape: one hash aggregate per subject → one hash
  * aggregate per duration → a single-partition sequential fold over the
  * duration-bounded frame (same topology as Holt: the recurrence is
  * inherently sequential, and its input is already aggregated down to
  * the time axis, so the fold's size is bounded by distinct durations,
  * not data). */
object Survival {

  private val GRID = java.math.BigInteger.valueOf(1000000000000L)

  /** @param df       one row per subject
    * @param duration integer duration column name (e.g. days)
    * @param event    event-flag column name (1 observed, 0 censored)
    * @return (duration, n_risk, d_events, c_censored, survival_e,
    *         hazard_cum_e) — `_e` on the 1e12 fixed-point grid,
    *         ascending duration, one row per distinct duration. */
  def kaplanMeier(df: DataFrame, duration: String,
                  event: String): DataFrame = {
    val spark = df.sparkSession
    val agg = df
      .filter(col(duration).isNotNull && col(event).isNotNull)
      .groupBy(col(duration).cast("long").as("__t"))
      .agg(sum(when(col(event) === 1, 1L).otherwise(0L)).as("__d"),
        sum(when(col(event) === 1, 0L).otherwise(1L)).as("__c"))
      // duration-bounded frame: the fold below needs one sorted
      // partition; coalesce(1) is safe exactly because the input is the
      // per-distinct-duration AGGREGATE, never subject rows
      .coalesce(1)
      .sortWithinPartitions(col("__t"))
    val rdd = agg.rdd.mapPartitions { it =>
      val rows = it.toArray // duration-bounded (distinct times only)
      val total = rows.map(r => r.getLong(1) + r.getLong(2)).sum
      var atRisk = total
      var s = GRID
      var h = java.math.BigInteger.ZERO
      rows.iterator.map { r =>
        val t = r.getLong(0); val d = r.getLong(1); val c = r.getLong(2)
        val n = atRisk
        val nBig = java.math.BigInteger.valueOf(n)
        s = s.multiply(java.math.BigInteger.valueOf(n - d)).divide(nBig)
        h = h.add(java.math.BigInteger.valueOf(d).multiply(GRID)
          .divide(nBig))
        atRisk -= d + c
        Row(t, n, d, c, s.longValueExact(), h.longValueExact())
      }
    }
    spark.createDataFrame(rdd, StructType(Seq(
      StructField("duration", LongType, nullable = false),
      StructField("n_risk", LongType, nullable = false),
      StructField("d_events", LongType, nullable = false),
      StructField("c_censored", LongType, nullable = false),
      StructField("survival_e", LongType, nullable = false),
      StructField("hazard_cum_e", LongType, nullable = false))))
  }
}
