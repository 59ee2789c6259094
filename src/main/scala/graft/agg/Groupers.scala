package graft.agg

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Grouper vocabulary (ref `xarray/groupers.py`): each grouper maps a
  * coordinate column to a bucket expression; `groupBy(bucket)` then gives
  * partial+final hash aggregation for free (the analog of flox map-reduce,
  * ref `core/groupby.py:1064`).
  *
  * xarray semantics the plain groupBy misses: `BinGrouper`/`TimeResampler`
  * emit EMPTY buckets (NaN rows) for bins with no data; [[reinstate]] adds
  * them back with a left join FROM the generated bucket table
  * (SURVEY.md §3.2 step 5).
  */
object Groupers {

  /** UniqueGrouper (ref `groupers.py:210`): group by the column itself. */
  def unique(c: String): Column = col(c)

  /** BinGrouper (ref `groupers.py:344`, pd.cut semantics: right-closed
    * intervals (lo, hi]). Returns the 0-based bin index; values outside
    * [lo, hi] get NULL like pd.cut's NaN. */
  def bins(c: Column, lo: Double, hi: Double, n: Int): Column = {
    val width = (hi - lo) / n
    val raw = ceil((c - lit(lo)) / lit(width)).cast("long") - 1L
    when(c > lo && c <= hi, greatest(raw, lit(0L)))
  }

  /** TimeResampler bucket (ref `groupers.py:474`): calendar-aligned
    * `date_trunc`; sub-daily/arbitrary origins use [[resampleOrigin]]. */
  def resample(t: Column, unit: String): Column = date_trunc(unit, t)

  /** Arbitrary-frequency resample bucket with explicit origin:
    * floor((t - origin) / step) * step + origin (ref `resample_cftime.py`). */
  def resampleOrigin(t: Column, originEpochSec: Long, stepSec: Long): Column = {
    val sec = unix_timestamp(t)
    timestamp_seconds(floor((sec - lit(originEpochSec)) / lit(stepSec))
      .cast("long") * lit(stepSec) + lit(originEpochSec))
  }

  /** SeasonGrouper "DJF/MAM/JJA/SON" (ref `groupers.py:801`). */
  def season(t: Column): Column =
    when(month(t).isin(12, 1, 2), "DJF")
      .when(month(t).isin(3, 4, 5), "MAM")
      .when(month(t).isin(6, 7, 8), "JJA")
      .otherwise("SON")

  /** Reinstate empty groups: left join the aggregated result back onto the
    * full bucket table so empty buckets appear as NULL rows — matching
    * xarray's `full_index` re-index (`groupby.py:976` `_maybe_reindex`). */
  def reinstate(buckets: DataFrame, agged: DataFrame, key: String): DataFrame =
    buckets.join(agged, Seq(key), "left")

  /** Generated bucket table for a time range (driver-side tiny, broadcast). */
  def timeBuckets(spark: SparkSession, startIso: String, endIso: String,
                  interval: String, key: String): DataFrame =
    spark.sql(
      s"""SELECT explode(sequence(timestamp'$startIso', timestamp'$endIso',
          interval $interval)) AS $key""")

  /** Quantile binning (pandas qcut; xarray groupby_bins with quantile
    * edges). Two passes at scale: one aggregation computes the k-1 interior
    * quantile boundaries, then a broadcast of that 1-row frame feeds a
    * when-chain bucket assign — no sort, no window. `bs` is the boundary
    * ARRAY column from the broadcast side; bins are right-closed like
    * pd.qcut: bin i = (b_{i-1}, b_i]. */
  def qcutAssign(v: Column, bs: Column, k: Int): Column =
    // NULL in ⇒ NULL bin (pd.qcut gives NaN for NaN); without the guard a
    // NULL comparison falls through every when() into the last bin.
    when(v.isNotNull,
      (k - 2 to 0 by -1).foldLeft(lit(k - 1)) { (acc, i) =>
        when(v <= bs.getItem(i), i).otherwise(acc)
      })
}
