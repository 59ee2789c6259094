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

  /** idxmax: label of the maximum (ref `dataset.py:9349`); deterministic
    * tie-break = smallest label, mirroring the reference's first-occurrence
    * semantics on a sorted coordinate. */
  def idxmax(label: Column, v: Column): Column = min_by(label, struct(v * lit(-1), label))
  def idxmin(label: Column, v: Column): Column = min_by(label, struct(v, label))
}
