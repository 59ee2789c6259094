package graft.numerics

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType
import org.apache.spark.sql.expressions.Window
import graft.align.AsOf

/** Numerics / statistics / interpolation verbs (SURVEY.md §2.10).
  *
  * Statistical moments are built from EXACT decimal power sums (single
  * distributed pass, partial+final combine) and finished with identical
  * double arithmetic — deterministic across partitioning AND across engines,
  * unlike naive float `covar_samp` whose result depends on reduce order.
  */
object Numerics {

  private def dsum(c: Column, scale: Int = 6): Column =
    sum(c.cast(DecimalType(38, scale))).cast("double")

  /** Sample covariance via normal sums: (Σxy − ΣxΣy/n) / (n−1)
    * (ref `computation/computation.py:46` `cov`, joint NA-mask `_cov_corr`). */
  def covSamp(x: Column, y: Column): Column = {
    val mask = x.isNotNull && y.isNotNull
    val n = count(when(mask, 1)).cast("double")
    val sx = dsum(when(mask, x)); val sy = dsum(when(mask, y))
    val sxy = dsum(when(mask, x * y))
    (sxy - sx * sy / n) / (n - 1)
  }

  /** Pearson correlation from exact sums (ref `computation.py:152` `corr`). */
  def corrP(x: Column, y: Column): Column = {
    val mask = x.isNotNull && y.isNotNull
    val n = count(when(mask, 1)).cast("double")
    val sx = dsum(when(mask, x)); val sy = dsum(when(mask, y))
    val sxy = dsum(when(mask, x * y))
    val sxx = dsum(when(mask, x * x)); val syy = dsum(when(mask, y * y))
    (n * sxy - sx * sy) / (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy))
  }

  /** Degree-1 polyfit per group via normal equations (ref
    * `computation/fit.py:101` polyfit; `duck_array_ops.least_squares`).
    * slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²); intercept = (Σy − m·Σx)/n.
    * One aggregation pass; higher degrees extend to a k×k solve on the same
    * power sums (driver-side, deg ≤ 10). */
  def fitSlope(x: Column, y: Column): Column = {
    val mask = x.isNotNull && y.isNotNull
    val n = count(when(mask, 1)).cast("double")
    val sx = dsum(when(mask, x)); val sy = dsum(when(mask, y))
    val sxy = dsum(when(mask, x * y)); val sxx = dsum(when(mask, x * x))
    (n * sxy - sx * sy) / (n * sxx - sx * sx)
  }
  def fitIntercept(x: Column, y: Column): Column = {
    val mask = x.isNotNull && y.isNotNull
    val n = count(when(mask, 1)).cast("double")
    val sx = dsum(when(mask, x)); val sy = dsum(when(mask, y))
    (sy - fitSlope(x, y) * sx) / n
  }

  /** polyval via Horner's rule (ref `computation.py:836`): fixed
    * association so every engine evaluates bit-identically. */
  def polyval(x: Column, coeffs: Seq[Double]): Column =
    coeffs.reverse.tail.foldLeft(lit(coeffs.last): Column)((acc, c) => acc * x + lit(c))

  /** differentiate: 2nd-order central differences with one-sided edges
    * (ref `dataset.py:8475`; kernel `duck_array_ops.gradient`). */
  def differentiate(v: Column, t: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val vNext = coalesce(lead(v, 1).over(w), v)
    val vPrev = coalesce(lag(v, 1).over(w), v)
    val tNext = coalesce(lead(t, 1).over(w), t)
    val tPrev = coalesce(lag(t, 1).over(w), t)
    (vNext - vPrev) / (tNext - tPrev)
  }

  /** trapezoidal integration along the coord (ref `dataset.py:8545`;
    * kernel `duck_array_ops.py:228`). Per-interval terms are decimal-
    * accumulated so the reduce order doesn't change the result. */
  def trapezoid(v: Column, t: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val term = (v + lag(v, 1).over(w)) / 2 * (t - lag(t, 1).over(w))
    term
  }

  /** Linear interpolation of per-`by` series (t, v) at probe times —
    * the reference's `interp(method="linear")` (`core/missing.py:616`).
    * Two as-of passes (backward + forward) + lerp; union+window plan, no
    * row multiplication (SURVEY.md §2.3 as-of mapping). */
  def interpLinear(series: DataFrame, probes: DataFrame, by: Seq[String],
                   t: String, v: String): DataFrame = {
    val obsB = series.select((by.map(col) :+ col(t) :+ col(v).as("__y0") :+
      col(t).as("__t0")): _*)
    val obsF = series.select((by.map(col) :+ col(t) :+ col(v).as("__y1") :+
      col(t).as("__t1")): _*)
    val back = AsOf.backward(probes, obsB, by, t, Seq("__y0", "__t0"))
    val both = AsOf.forward(back, obsF, by, t, Seq("__y1", "__t1"))
    // timestamps -> exact integer micros (a fractional-seconds cast would
    // round per-value and diverge from integer-based engines at ~1e-11)
    val isTs = series.schema(t).dataType ==
      org.apache.spark.sql.types.TimestampType
    def toD(c: Column): Column =
      if (isTs) unix_micros(c).cast("double") else c.cast("double")
    val tD = toD(col(t))
    val t0 = toD(col("__t0")); val t1 = toD(col("__t1"))
    // outside the observed range -> NULL (xarray: NaN, no extrapolation)
    val interp = when(col("__t0").isNull || col("__t1").isNull, lit(null))
      .when(t1 === t0, col("__y0"))
      .otherwise(col("__y0") + (col("__y1") - col("__y0")) * (tD - t0) / (t1 - t0))
    both.withColumn("v_interp", interp)
      .drop("__y0", "__y1", "__t0", "__t1")
  }

  /** interp(method="nearest"): pick whichever bracketing observation is
    * closer in coord space; ties -> the earlier one (pandas `nearest`).
    * Same two as-of passes as linear. */
  def interpNearest(series: DataFrame, probes: DataFrame, by: Seq[String],
                    t: String, v: String): DataFrame = {
    val obsB = series.select((by.map(col) :+ col(t) :+ col(v).as("__y0") :+
      col(t).as("__t0")): _*)
    val obsF = series.select((by.map(col) :+ col(t) :+ col(v).as("__y1") :+
      col(t).as("__t1")): _*)
    val back = AsOf.backward(probes, obsB, by, t, Seq("__y0", "__t0"))
    val both = AsOf.forward(back, obsF, by, t, Seq("__y1", "__t1"))
    val isTs = series.schema(t).dataType ==
      org.apache.spark.sql.types.TimestampType
    def toD(c: Column): Column =
      if (isTs) unix_micros(c).cast("double") else c.cast("double")
    val dBack = toD(col(t)) - toD(col("__t0"))
    val dFwd = toD(col("__t1")) - toD(col(t))
    val nearest = when(col("__t0").isNull, col("__y1"))
      .when(col("__t1").isNull, col("__y0"))
      .when(dBack <= dFwd, col("__y0"))
      .otherwise(col("__y1"))
    both.withColumn("v_nearest", nearest)
      .drop("__y0", "__y1", "__t0", "__t1")
  }

  /** Degree-2 polyfit per group, closed-form normal equations over exact
    * decimal power sums (moments s0..s4, t0..t2), solved by Cramer's rule
    * in identical double arithmetic (ref `computation/fit.py:101`; the
    * general-degree path builds the same Vandermonde moments). Returns a
    * struct(c0, c1, c2) for y ~ c0 + c1 x + c2 x². */
  def fit2(x: Column, y: Column): Column = {
    val mask = x.isNotNull && y.isNotNull
    def m(c: Column) = when(mask, c)
    // scales chosen so every sum stays <= ~15 significant digits: the
    // decimal->double cast is then exactly rounded on every engine
    val s0 = count(m(lit(1))).cast("double")
    val s1 = dsum(m(x)); val s2 = dsum(m(x * x))
    val s3 = dsum(m(x * x * x), 2); val s4 = dsum(m(x * x * x * x), 2)
    val t0 = dsum(m(y), 4); val t1 = dsum(m(x * y), 2); val t2 = dsum(m(x * x * y), 2)
    // Cramer on the symmetric 3x3 [s0 s1 s2; s1 s2 s3; s2 s3 s4]
    val det = s0 * (s2 * s4 - s3 * s3) - s1 * (s1 * s4 - s3 * s2) +
      s2 * (s1 * s3 - s2 * s2)
    val d0 = t0 * (s2 * s4 - s3 * s3) - s1 * (t1 * s4 - s3 * t2) +
      s2 * (t1 * s3 - s2 * t2)
    val d1 = s0 * (t1 * s4 - t2 * s3) - t0 * (s1 * s4 - s3 * s2) +
      s2 * (s1 * t2 - t1 * s2)
    val d2 = s0 * (s2 * t2 - s3 * t1) - s1 * (s1 * t2 - s3 * t0) +
      t0 * (s1 * s3 - s2 * s2)
    struct((d0 / det).as("c0"), (d1 / det).as("c1"), (d2 / det).as("c2"))
  }

  /** interpolate_na: fill interior NULL runs by linear interpolation
    * between bracketing valid values (ref `core/missing.py:331`
    * `interp_na`); edges stay NULL like the reference default. */
  def interpolateNa(df: DataFrame, by: Seq[Column], order: Seq[Column],
                    t: Column, v: String): DataFrame = {
    def wAsc = Window.partitionBy(by: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    def wDesc = Window.partitionBy(by: _*).orderBy(order.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    val y0 = last(col(v), ignoreNulls = true).over(wAsc)
    val t0 = last(when(col(v).isNotNull, t), ignoreNulls = true).over(wAsc)
    val y1 = last(col(v), ignoreNulls = true).over(wDesc)
    val t1 = last(when(col(v).isNotNull, t), ignoreNulls = true).over(wDesc)
    val tD = t.cast("double")
    val filled = when(col(v).isNotNull, col(v))
      .when(y0.isNull || y1.isNull, lit(null))
      .when(t1.cast("double") === t0.cast("double"), y0)
      .otherwise(y0 + (y1 - y0) * (tD - t0.cast("double")) /
        (t1.cast("double") - t0.cast("double")))
    df.withColumn(v + "_interp", filled)
  }

  /** Exact decimal dot product of two float arrays (ref `computation.py:484`
    * `dot` — einsum contraction; here the contraction dim is the array
    * axis). Sequential fold with decimal accumulator: order-fixed, so
    * identical on any engine. */
  def dotDecimal(a: Column, b: Column): Column = {
    // Accumulator precision 30 (not 38): Spark decimal ADD grows precision
    // by one and caps at 38 by REDUCING SCALE — a (38,12)+(38,12) add would
    // silently round to scale 11. (30,12)+(30,12) -> (31,12) stays exact.
    val prods = zip_with(a, b, (x, y) =>
      (x.cast("double") * y.cast("double")).cast(DecimalType(30, 12)))
    aggregate(prods, lit(0).cast(DecimalType(30, 12)),
      (acc, x) => (acc + x).cast(DecimalType(30, 12))).cast("double")
  }

  /** L2 norm from the decimal self-dot. */
  def normDecimal(a: Column): Column = sqrt(dotDecimal(a, a))
}
