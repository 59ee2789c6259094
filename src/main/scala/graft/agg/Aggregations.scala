package graft.agg

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Reduction vocabulary with xarray's NA semantics (ref generated
  * `core/_aggregations.py`; kernels `duck_array_ops.py:510` +
  * `computation/nanops.py`). Missing = SQL NULL (SURVEY.md §1.5).
  *
  * Spark aggregates skip NULLs natively = xarray `skipna=True` default.
  * `skipna=False` (NaN-poisoning) and `min_count` are wrappers.
  */
object Aggregations {

  /** skipna=False: result is NULL if ANY input is NULL (numpy NaN
    * propagation). */
  def skipnaFalse(agg: Column, c: Column): Column =
    when(count(when(c.isNull, 1)) === 0, agg)

  /** min_count (sum/prod, ref `_aggregations.py` min_count param): result
    * NULL unless >= n non-null values contributed. */
  def minCount(agg: Column, c: Column, n: Int): Column =
    when(count(c) >= n, agg)

  /** Exact product via sum of logs is lossy; for xarray `prod` use
    * exp(sum(ln)) only for positive data — general product needs a custom
    * aggregate; sign handled via parity of negatives. NULL-skipping. */
  def prod(c: Column): Column = {
    val negatives = sum(when(c < 0, 1).otherwise(0))
    val zeros = sum(when(c === 0, 1).otherwise(0))
    val magnitude = exp(sum(log(abs(nullif(c, lit(0))))))
    when(zeros > 0, lit(0.0))
      .otherwise(magnitude * when(pmod(negatives, lit(2)) === 1, -1.0).otherwise(1.0))
  }

  /** Weighted mean with joint NULL masking (ref `computation/weighted.py:135`:
    * weights where value is NULL are excluded from sum_of_weights). Decimal
    * accumulation for cross-engine determinism. */
  def weightedMean(v: Column, w: Column, scale: Int = 6): Column = {
    val wv = when(v.isNotNull && w.isNotNull, w * v)
    val wOnly = when(v.isNotNull && w.isNotNull, w)
    sum(wv.cast(DecimalType(38, scale))).cast("double") /
      sum(wOnly.cast(DecimalType(38, scale))).cast("double")
  }

  /** Weighted variance (ref `computation/weighted.py:243` `Weighted.var`,
    * ddof=0 population form): Σw·(x−x̄w)²/Σw expanded to the power-sum form
    * Σw·x²/Σw − (Σw·x/Σw)². Joint NULL masking like [[weightedMean]].
    *
    * Cross-engine exactness: the INPUTS are cast to decimal at their
    * natural scale (exact when the data has <= vScale/wScale decimals —
    * the cast is then far from any rounding tie, unlike casting the
    * double PRODUCT, where Spark's shortest-repr digits and DuckDB's
    * exact binary expansion can disagree at the target scale). All
    * products then stay in exact decimal arithmetic, so the three sums
    * are bit-reproducible under any aggregation order. */
  def weightedVar(v: Column, w: Column,
                  vScale: Int = 2, wScale: Int = 2): Column = {
    val both = v.isNotNull && w.isNotNull
    val vd = when(both, v).cast(DecimalType(18, vScale))
    val wd = when(both, w).cast(DecimalType(12, wScale))
    // v² is re-capped to (20, 2*vScale) — exact for |v| < 1e8 — so the
    // final product stays within DECIMAL(38) without precision loss
    val v2 = (vd * vd).cast(DecimalType(20, 2 * vScale))
    val sw = sum(wd).cast("double")
    val swx = sum(wd * vd).cast("double")
    val swx2 = sum(v2 * wd).cast("double")
    swx2 / sw - (swx / sw) * (swx / sw)
  }

  /** Weighted standard deviation = sqrt of [[weightedVar]] (ref
    * `weighted.py:269` `Weighted.std`). */
  def weightedStd(v: Column, w: Column,
                  vScale: Int = 2, wScale: Int = 2): Column =
    sqrt(weightedVar(v, w, vScale, wScale))

  /** idxmax: label of the maximum (ref `dataset.py:9349`); deterministic
    * tie-break = smallest label, mirroring the reference's first-occurrence
    * semantics on a sorted coordinate. */
  def idxmax(label: Column, v: Column): Column = min_by(label, struct(v * lit(-1), label))
  def idxmin(label: Column, v: Column): Column = min_by(label, struct(v, label))

  /** sum_of_weights (ref `weighted.py:192`): Σw over rows where BOTH value
    * and weight are present — the joint mask all weighted reductions share. */
  def sumOfWeights(v: Column, w: Column, scale: Int = 6): Column =
    sum(when(v.isNotNull && w.isNotNull, w).cast(DecimalType(38, scale)))
      .cast("double")

  /** sum_of_squares (ref `weighted.py:220`): Σw·x², joint-masked, in exact
    * decimal like [[weightedVar]]. */
  def sumOfSquares(v: Column, w: Column,
                   vScale: Int = 2, wScale: Int = 2): Column = {
    val both = v.isNotNull && w.isNotNull
    val vd = when(both, v).cast(DecimalType(18, vScale))
    val wd = when(both, w).cast(DecimalType(12, wScale))
    val v2 = (vd * vd).cast(DecimalType(20, 2 * vScale))
    sum(v2 * wd).cast("double")
  }
}
