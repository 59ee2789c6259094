package graft.agg

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Robust (outlier-resistant) statistics — the quality-metric layer used
  * when corpus measures (lengths, scores, prices) are heavy-tailed and
  * mean/std are dominated by the tail.
  *
  * Exactness contract: built on quantiles at EXACT binary fractions
  * (0.25, 0.5, 0.75) over integer-valued columns, so the Hyndman-Fan-7
  * interpolation a + frac*(b-a) is exact in double arithmetic — every
  * derived bound (median, MAD, Tukey fences) is bit-identical across
  * engines with no expression-order sensitivity, and boundary
  * comparisons cannot flip on a ulp.
  *
  * Scale shape: each verb is two aggregate passes with a broadcast of
  * the per-group bounds frame between them (groups x constants — tiny);
  * no windows, no self-joins.
  */
object Robust {

  /** Per-group median and MAD (median absolute deviation):
    * mad = median(|x - median(x)|), the robust spread estimator. */
  def mad(df: DataFrame, group: String, v: String): DataFrame = {
    val med = df.groupBy(group)
      .agg(percentile(col(v), lit(0.5)).as("med"))
    df.join(broadcast(med), group)
      .withColumn("__absdev", abs(col(v) - col("med")))
      .groupBy(group)
      .agg(max(col("med")).as("med"), // constant within the group
        percentile(col("__absdev"), lit(0.5)).as("mad"))
  }

  /** Interquartile mean: the mean of the values inside [q1, q3]
    * (inclusive) — a 25%-trimmed robust location estimator. The mean is
    * the repo's exactAvg (decimal sum cast double / count). */
  def interquartileMean(df: DataFrame, group: String, v: String,
                        scale: Int = 6): DataFrame = {
    val qs = df.groupBy(group).agg(
      percentile(col(v), lit(0.25)).as("q1"),
      percentile(col(v), lit(0.75)).as("q3"))
    df.join(broadcast(qs), group)
      .filter(col(v) >= col("q1") && col(v) <= col("q3"))
      .groupBy(group)
      .agg(count(lit(1)).as("n_kept"),
        round(sum(col(v).cast(org.apache.spark.sql.types.DecimalType(30, 4)))
          .cast("double") / count(lit(1)), scale).as("iqm"))
  }

  /** Winsorized mean: values CLAMPED to [q1, q3] (quartile
    * winsorization — the clip-don't-drop robust location estimator;
    * [[interquartileMean]] is the drop variant). The clamped values are
    * either the original integers or the exact quarter-valued quartile
    * bounds, so the 4-dp decimal sum is exact. */
  def winsorizedMean(df: DataFrame, group: String, v: String,
                     scale: Int = 6): DataFrame = {
    val qs = df.groupBy(group).agg(
      percentile(col(v), lit(0.25)).as("q1"),
      percentile(col(v), lit(0.75)).as("q3"))
    df.join(broadcast(qs), group)
      .withColumn("__w", least(greatest(col(v).cast("double"),
        col("q1")), col("q3")))
      .groupBy(group)
      .agg(count(lit(1)).as("n"),
        round(sum(col("__w").cast(org.apache.spark.sql.types
            .DecimalType(30, 4)))
          .cast("double") / count(lit(1)), scale).as("wmean"))
  }

  /** Tukey fences: flag values outside [q1 - k*IQR, q3 + k*IQR]
    * (k = 1.5 classic). Returns per-group fences, outlier count, and the
    * outliers' integral sum (0 when none). k must be an exact binary
    * fraction (1.5, 1.25, 3.0) for the cross-engine exactness
    * contract. */
  def tukeyOutliers(df: DataFrame, group: String, v: String,
                    k: Double = 1.5): DataFrame = {
    val qs = df.groupBy(group).agg(
      percentile(col(v), lit(0.25)).as("q1"),
      percentile(col(v), lit(0.75)).as("q3"))
    val lo = col("q1") - lit(k) * (col("q3") - col("q1"))
    val hi = col("q3") + lit(k) * (col("q3") - col("q1"))
    df.join(broadcast(qs), group)
      .withColumn("__lo", lo).withColumn("__hi", hi)
      .withColumn("__out", col(v) < col("__lo") || col(v) > col("__hi"))
      .groupBy(group)
      .agg(max(col("__lo")).as("lo"), max(col("__hi")).as("hi"),
        sum(when(col("__out"), 1L).otherwise(0L)).as("n_out"),
        coalesce(sum(when(col("__out"), col(v))), lit(0L)).as("out_sum"))
  }
}
