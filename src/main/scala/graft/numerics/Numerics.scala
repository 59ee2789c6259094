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

  /** Weighted degree-1 polyfit (ref `computation/fit.py` polyfit w=):
    * minimize Σw(y−a−bx)²; decimal-exact weighted moments with the joint
    * NULL mask all weighted reductions share. */
  def fitSlopeW(x: Column, y: Column, wt: Column): Column = {
    val mask = x.isNotNull && y.isNotNull && wt.isNotNull
    val sw = dsum(when(mask, wt)); val swx = dsum(when(mask, wt * x))
    val swy = dsum(when(mask, wt * y))
    val swxy = dsum(when(mask, wt * x * y))
    val swxx = dsum(when(mask, wt * x * x))
    (sw * swxy - swx * swy) / (sw * swxx - swx * swx)
  }
  def fitInterceptW(x: Column, y: Column, wt: Column): Column = {
    val mask = x.isNotNull && y.isNotNull && wt.isNotNull
    val sw = dsum(when(mask, wt)); val swx = dsum(when(mask, wt * x))
    val swy = dsum(when(mask, wt * y))
    (swy - fitSlopeW(x, y, wt) * swx) / sw
  }

  /** polyval via Horner's rule (ref `computation.py:836`): fixed
    * association so every engine evaluates bit-identically. */
  def polyval(x: Column, coeffs: Seq[Double]): Column =
    coeffs.reverse.tail.foldLeft(lit(coeffs.last): Column)((acc, c) => acc * x + lit(c))

  /** differentiate (ref `dataset.py:8475`; kernel `duck_array_ops.gradient`
    * = numpy.gradient): second-order accurate on NON-uniform spacing via
    * the weighted three-point stencil
    * `f'_i = a·f_{i-1} + b·f_i + c·f_{i+1}` with
    * `a = -h_d/(h_s(h_s+h_d))`, `b = (h_d-h_s)/(h_s·h_d)`,
    * `c = h_s/(h_d(h_s+h_d))` (h_s/h_d the left/right gaps) — the naive
    * `(f_{i+1}-f_{i-1})/(t_{i+1}-t_{i-1})` is only second-order when the
    * gaps are equal. Edges: `edgeOrder` 1 = one-sided difference (numpy's
    * default), 2 = three-point one-sided stencil; a series too short for
    * the order falls back to the lower one. */
  def differentiate(v: Column, t: Column,
                    w: org.apache.spark.sql.expressions.WindowSpec,
                    edgeOrder: Int = 1): Column = {
    require(edgeOrder == 1 || edgeOrder == 2, s"edgeOrder $edgeOrder")
    val vN = lead(v, 1).over(w); val vP = lag(v, 1).over(w)
    val tN = lead(t, 1).over(w); val tP = lag(t, 1).over(w)
    val hs = t - tP; val hd = tN - t
    val interior =
      (-hd / (hs * (hs + hd))) * vP +
        ((hd - hs) / (hs * hd)) * v +
        (hs / (hd * (hs + hd))) * vN
    val first1 = (vN - v) / (tN - t)
    val last1 = (v - vP) / (t - tP)
    val (first, last) =
      if (edgeOrder == 1) (first1, last1)
      else {
        val vN2 = lead(v, 2).over(w); val tN2 = lead(t, 2).over(w)
        val vP2 = lag(v, 2).over(w); val tP2 = lag(t, 2).over(w)
        val f2 = { // h1 = first gap, h2 = second gap
          val h1 = tN - t; val h2 = tN2 - tN
          (-(lit(2) * h1 + h2) / (h1 * (h1 + h2))) * v +
            ((h1 + h2) / (h1 * h2)) * vN -
            (h1 / (h2 * (h1 + h2))) * vN2
        }
        val l2 = { // h1 = last gap, h2 = the one before it
          val h1 = t - tP; val h2 = tP - tP2
          ((lit(2) * h1 + h2) / (h1 * (h1 + h2))) * v -
            ((h1 + h2) / (h1 * h2)) * vP +
            (h1 / (h2 * (h1 + h2))) * vP2
        }
        // fall back to the order-1 edge only when the series is too SHORT
        // (second neighbor coord absent) — not when a value is null, which
        // must propagate like numpy's NaN
        (when(tN2.isNull, first1).otherwise(f2),
         when(tP2.isNull, last1).otherwise(l2))
      }
    // Series boundaries are where the neighbor COORD is absent; a null
    // neighbor VALUE mid-series must yield null (numpy.gradient with NaN),
    // not silently degrade to a one-sided stencil.
    when(tP.isNull && tN.isNull, lit(null).cast("double"))
      .when(tP.isNull, first)
      .when(tN.isNull, last)
      .otherwise(interior)
  }

  /** trapezoidal integration along the coord (ref `dataset.py:8545`;
    * kernel `duck_array_ops.py:228`). Per-interval terms are decimal-
    * accumulated so the reduce order doesn't change the result. */
  def trapezoid(v: Column, t: Column, w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    val term = (v + lag(v, 1).over(w)) / 2 * (t - lag(t, 1).over(w))
    term
  }

  /** cumulative_integrate (ref `dataset.py:8584` cumulative_integrate;
    * scipy cumulative_trapezoid semantics with the leading zero): running
    * trapezoid AUC at each coord point. The per-interval terms accumulate
    * in DECIMAL over the prefix window so the prefix sums are reduce-order
    * independent (cross-engine exact); first row coalesces to 0.0. */
  def cumulativeIntegrate(v: Column, t: Column,
      w: org.apache.spark.sql.expressions.WindowSpec): Column = {
    import org.apache.spark.sql.types.DecimalType
    val run = sum(trapezoid(v, t, w).cast(DecimalType(38, 4)))
      .over(w.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0))
    coalesce(run.cast("double"), lit(0.0))
  }

  /** Timestamp coords -> exact integer micros (a fractional-seconds cast
    * would round per-value and diverge from integer-based engines at
    * ~1e-11); non-timestamp coords cast straight to double. ONE definition
    * — every interp kernel shares this exactness contract. */
  private[numerics] def tsToDouble(df: DataFrame, t: String): Column => Column = {
    val isTs = df.schema(t).dataType ==
      org.apache.spark.sql.types.TimestampType
    c => if (isTs) unix_micros(c).cast("double") else c.cast("double")
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
    val toD = tsToDouble(series, t)
    val tD = toD(col(t))
    val t0 = toD(col("__t0")); val t1 = toD(col("__t1"))
    // outside the observed range -> NULL (xarray: NaN, no extrapolation)
    val interp = when(col("__t0").isNull || col("__t1").isNull, lit(null))
      .when(t1 === t0, col("__y0"))
      .otherwise(col("__y0") + (col("__y1") - col("__y0")) * (tD - t0) / (t1 - t0))
    both.withColumn("v_interp", interp)
      .drop("__y0", "__y1", "__t0", "__t1")
  }

  /** interp(method="linear", kwargs={"fill_value": "extrapolate"}) — the
    * scipy pass-through xarray exposes: probes OUTSIDE a series' observed
    * range ride the edge segment's slope instead of returning NULL.
    * Interior probes are exactly [[interpLinear]].
    *
    * Scale shape: the edge segments come from two tiny per-group
    * aggregations (first/last observation via struct min/max, then the
    * adjacent point among the remainder) that broadcast back onto the
    * probe side — no window over the series, no extra shuffle of the big
    * table. Single-observation groups extrapolate as a constant. */
  def interpLinearExtrapolate(series: DataFrame, probes: DataFrame,
                              by: Seq[String], t: String,
                              v: String): DataFrame = {
    val base = interpLinear(series, probes, by, t, v)
    val toD = tsToDouble(series, t)
    val ends = series.groupBy(by.map(col): _*)
      .agg(min(struct(col(t), col(v))).as("__lo"),
        max(struct(col(t), col(v))).as("__hi"))
    val withEnds = series.join(broadcast(ends), by)
    val lo2 = withEnds.filter(col(t) > col("__lo").getField(t))
      .groupBy(by.map(col): _*)
      .agg(min(struct(col(t), col(v))).as("__lo2"))
    val hi2 = withEnds.filter(col(t) < col("__hi").getField(t))
      .groupBy(by.map(col): _*)
      .agg(max(struct(col(t), col(v))).as("__hi2"))
    val edges = ends.join(lo2, by, "left").join(hi2, by, "left")
    def seg(aT: Column, aV: Column, bT: Column, bV: Column): Column =
      aV + (bV - aV) * (toD(col(t)) - toD(aT)) / (toD(bT) - toD(aT))
    val loT = col("__lo").getField(t); val loV = col("__lo").getField(v)
    val hiT = col("__hi").getField(t); val hiV = col("__hi").getField(v)
    val below = when(col("__lo2").isNull, loV) // single point -> constant
      .otherwise(seg(loT, loV, col("__lo2").getField(t),
        col("__lo2").getField(v)))
    val above = when(col("__hi2").isNull, hiV)
      .otherwise(seg(hiT, hiV, col("__hi2").getField(t),
        col("__hi2").getField(v)))
    base.join(broadcast(edges), by, "left")
      .withColumn("v_interp",
        when(col("v_interp").isNotNull, col("v_interp"))
          .when(col("__lo").isNull, lit(null)) // group absent from series
          .when(toD(col(t)) < toD(loT), below)
          .when(toD(col(t)) > toD(hiT), above)
          .otherwise(col("v_interp")))
      .drop("__lo", "__hi", "__lo2", "__hi2")
  }

  /** N-D orthogonal interpolation, 2-D (bilinear) case (ref
    * `dataset.py:4114` interp over multiple dims; the reference applies
    * 1-D interpolation sequentially per dim — same semantics here): first
    * interp along `x` at every grid `y`-line for each distinct probe x,
    * then interp the result along `y`. Probes outside the grid hull ->
    * NULL (no extrapolation, both stages). Intermediate size is
    * |distinct probe x| * |grid y-lines| — the orthogonal-interp
    * contract, NOT |probes| * |grid| (each stage is the usual
    * union+window as-of, no row multiplication within a stage). */
  def interpBilinear(grid: DataFrame, probes: DataFrame,
                     x: String, y: String, v: String): DataFrame = {
    val probes1 = probes.select(col(x)).distinct()
      .crossJoin(grid.select(col(y)).distinct())
    val g1 = interpLinear(grid, probes1, by = Seq(y), t = x, v = v)
      .select(col(x), col(y), col("v_interp").as("__vx"))
    interpLinear(g1, probes, by = Seq(x), t = y, v = "__vx")
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
    val toD = tsToDouble(series, t)
    val dBack = toD(col(t)) - toD(col("__t0"))
    val dFwd = toD(col("__t1")) - toD(col(t))
    val nearest = when(col("__t0").isNull, col("__y1"))
      .when(col("__t1").isNull, col("__y0"))
      .when(dBack <= dFwd, col("__y0"))
      .otherwise(col("__y1"))
    both.withColumn("v_nearest", nearest)
      .drop("__y0", "__y1", "__t0", "__t1")
  }

  /** interp(method="zero"): zero-order spline — the PREVIOUS knot's value
    * holds until the next knot (scipy interp1d kind="zero"). Same two
    * as-of passes as linear (the forward pass only bounds the range);
    * probes outside the knot range -> NULL. */
  def interpZero(series: DataFrame, probes: DataFrame, by: Seq[String],
                 t: String, v: String): DataFrame = {
    val obsB = series.select((by.map(col) :+ col(t) :+ col(v).as("__y0") :+
      col(t).as("__t0")): _*)
    val obsF = series.select((by.map(col) :+ col(t) :+ col(t).as("__t1")): _*)
    val back = AsOf.backward(probes, obsB, by, t, Seq("__y0", "__t0"))
    val both = AsOf.forward(back, obsF, by, t, Seq("__t1"))
    val out = when(col("__t0").isNull || col("__t1").isNull, lit(null))
      .otherwise(col("__y0"))
    both.withColumn("v_zero", out).drop("__y0", "__t0", "__t1")
  }

  /** interp(method="quadratic"): C1 quadratic spline with the left-end
    * slope clamped to the first secant (d_0 = m_0); continuity then fixes
    * every other knot slope via d_{i+1} = 2·m_i − d_i. The recurrence has
    * the closed form d_i = (−1)^i·(m_0 + 2·Σ_{k=1..i} (−1)^k·m_{k−1}) — a
    * RUNNING window sum, so the whole operator stays declarative (ordered
    * running sums fold sequentially in both engines, float-reproducible).
    * Piece on [t_i, t_{i+1}]: y_i + d_i·dt + (m_i − d_i)·dt²/h_i. */
  def interpQuadratic(series: DataFrame, probes: DataFrame, by: Seq[String],
                      t: String, v: String): DataFrame = {
    val isTs = series.schema(t).dataType ==
      org.apache.spark.sql.types.TimestampType
    // time in DAYS, not µs: the knot-slope recurrence below accumulates in
    // decimal for cross-engine determinism, and day-scale slopes (~1e2)
    // survive the decimal quantization where µs-scale ones (~1e-9) would not
    def toD(c: Column): Column =
      if (isTs) unix_micros(c).cast("double") / 86400000000.0
      else c.cast("double")
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__t"))
    val kn = series.select((by.map(col) :+ toD(col(t)).as("__t") :+
      col(v).cast("double").as("__y")): _*)
      .withColumn("__tp", lead("__t", 1).over(w))
      .withColumn("__yp", lead("__y", 1).over(w))
      .withColumn("__h", col("__tp") - col("__t"))
      .withColumn("__m", (col("__yp") - col("__y")) / col("__h"))
      .withColumn("__j", row_number().over(w) - 1)
      .withColumn("__mprev", lag("__m", 1).over(w))
      .withColumn("__term",
        when(col("__j") === 0, col("__m"))
          .otherwise(lit(2.0) *
            when(pmod(col("__j"), lit(2)) === 1, lit(-1.0)).otherwise(lit(1.0)) *
            col("__mprev")))
      // Spark's running window sum accumulates row by row (a sequential
      // left fold); DuckDB's window agg adds pairwise (segment tree) and
      // drifts by ulps on long series, so the ORACLE mirrors this with an
      // explicit list prefix-fold instead of a window sum
      .withColumn("__e",
        sum("__term").over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .withColumn("__d",
        when(pmod(col("__j"), lit(2)) === 1, -col("__e")).otherwise(col("__e")))
    val kn2 = kn.select((by.map(col) :+ col("__t") :+ col("__t").as("__t0") :+
      col("__y").as("__y0") :+ col("__d").as("__d0") :+ col("__m").as("__m0") :+
      col("__h").as("__h0") :+ col("__tp").as("__t1")): _*)
    val prb = probes.select((by.map(col) :+ toD(col(t)).as("__t")): _*)
    val joined = AsOf.backward(prb, kn2, by, "__t",
      Seq("__t0", "__y0", "__d0", "__m0", "__h0", "__t1"))
    val dt = col("__t") - col("__t0")
    val out = when(col("__t0").isNull, lit(null))
      .when(col("__t") === col("__t0"), col("__y0"))
      .when(col("__t1").isNull, lit(null))
      .otherwise(col("__y0") + col("__d0") * dt +
        (col("__m0") - col("__d0")) * dt * dt / col("__h0"))
    joined.withColumn("v_quadratic", out)
      .select((by.map(col) :+ col("__t").as("t_probe") :+ col("v_quadratic")): _*)
  }

  /** interp(method="quintic"): quintic Hermite — each knot carries a
    * first-derivative estimate (3-point nonuniform central difference,
    * one-sided secant at the ends) and a second-derivative estimate
    * (2·(m_next − m_prev)/(h_prev + h_next), 0 at the ends); each
    * interval then gets the unique degree-5 polynomial matching
    * (y, y', y'') at both ends — C2 overall, window-local, declarative. */
  def interpQuintic(series: DataFrame, probes: DataFrame, by: Seq[String],
                    t: String, v: String): DataFrame = {
    val toD = tsToDouble(series, t)
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__t"))
    val kn = series.select((by.map(col) :+ toD(col(t)).as("__t") :+
      col(v).cast("double").as("__y")): _*)
      .withColumn("__tp", lead("__t", 1).over(w))
      .withColumn("__yp", lead("__y", 1).over(w))
      .withColumn("__hn", col("__tp") - col("__t"))
      .withColumn("__dn", (col("__yp") - col("__y")) / col("__hn"))
      .withColumn("__hm", lag("__hn", 1).over(w))
      .withColumn("__dm", lag("__dn", 1).over(w))
      .withColumn("__d",
        when(col("__dm").isNull && col("__dn").isNull, lit(0.0))
          .when(col("__dm").isNull, col("__dn"))
          .when(col("__dn").isNull, col("__dm"))
          .otherwise((col("__hn") * col("__dm") + col("__hm") * col("__dn"))
            / (col("__hm") + col("__hn"))))
      .withColumn("__c",
        when(col("__dm").isNull || col("__dn").isNull, lit(0.0))
          .otherwise(lit(2.0) * (col("__dn") - col("__dm"))
            / (col("__hm") + col("__hn"))))
    val kn2 = kn
      .withColumn("__d1", lead("__d", 1).over(w))
      .withColumn("__c1", lead("__c", 1).over(w))
      .select((by.map(col) :+ col("__t") :+ col("__t").as("__t0") :+
        col("__y").as("__y0") :+ col("__d").as("__d0") :+ col("__c").as("__c0") :+
        col("__tp").as("__t1") :+ col("__yp").as("__y1") :+
        col("__d1") :+ col("__c1")): _*)
    val prb = probes.select((by.map(col) :+ toD(col(t)).as("__t")): _*)
    val joined = AsOf.backward(prb, kn2, by, "__t",
      Seq("__t0", "__y0", "__d0", "__c0", "__t1", "__y1", "__d1", "__c1"))
      .withColumn("__h", col("__t1") - col("__t0"))
      .withColumn("__s", (col("__t") - col("__t0")) / col("__h"))
    val s = col("__s"); val h = col("__h")
    val s2 = s * s; val s3 = s2 * s; val s4 = s3 * s; val s5 = s4 * s
    val quintic =
      col("__y0") * (lit(1.0) - lit(10.0) * s3 + lit(15.0) * s4 - lit(6.0) * s5) +
        (h * col("__d0")) * (s - lit(6.0) * s3 + lit(8.0) * s4 - lit(3.0) * s5) +
        ((h * h) * col("__c0")) *
          (lit(0.5) * (s2 - lit(3.0) * s3 + lit(3.0) * s4 - s5)) +
        col("__y1") * (lit(10.0) * s3 - lit(15.0) * s4 + lit(6.0) * s5) +
        (h * col("__d1")) * (lit(-4.0) * s3 + lit(7.0) * s4 - lit(3.0) * s5) +
        ((h * h) * col("__c1")) * (lit(0.5) * (s3 - lit(2.0) * s4 + s5))
    val out = when(col("__t0").isNull, lit(null))
      .when(col("__t") === col("__t0"), col("__y0"))
      .when(col("__t1").isNull, lit(null))
      .otherwise(quintic)
    joined.withColumn("v_quintic", out)
      .select((by.map(col) :+ col("__t").as("t_probe") :+ col("v_quintic")): _*)
  }

  /** interp(method="pchip"): monotone cubic Hermite with Fritsch–Carlson
    * slopes (ref `core/missing.py:616` interp method="pchip" -> scipy
    * `PchipInterpolator`). Unlike the natural cubic spline, PCHIP slopes
    * are LOCAL (each uses at most the two neighboring secants), so the
    * whole operator is declarative: one window pass over the knots + one
    * as-of join of probes — no per-group gather, no driver iteration, and
    * it scales exactly like interpLinear at 100 TB.
    *
    * Slope rules (scipy semantics): interior knots get the weighted
    * harmonic mean of the two secants when they share a sign, else 0;
    * endpoints use the one-sided three-point estimate with the shape-
    * preserving clamps; 2-point series fall back to the secant (linear).
    * Probes outside the knot range -> NULL (no extrapolation). */
  def interpPchip(series: DataFrame, probes: DataFrame, by: Seq[String],
                  t: String, v: String): DataFrame = {
    val toD = tsToDouble(series, t)
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__t"))
    val kn = series.select((by.map(col) :+ toD(col(t)).as("__t") :+
      col(v).cast("double").as("__y")): _*)
      // neighbor coords first, then h/delta/slopes: each layer is
      // materialized with withColumn so shared subexpressions aren't
      // textually duplicated (and recomputed) downstream
      .withColumn("__tm", lag("__t", 1).over(w))
      .withColumn("__ym", lag("__y", 1).over(w))
      .withColumn("__tp", lead("__t", 1).over(w))
      .withColumn("__yp", lead("__y", 1).over(w))
      .withColumn("__tpp", lead("__t", 2).over(w))
      .withColumn("__ypp", lead("__y", 2).over(w))
      .withColumn("__tmm", lag("__t", 2).over(w))
      .withColumn("__ymm", lag("__y", 2).over(w))
      .withColumn("__hm", col("__t") - col("__tm"))
      .withColumn("__hn", col("__tp") - col("__t"))
      .withColumn("__dm", (col("__y") - col("__ym")) / col("__hm"))
      .withColumn("__dn", (col("__yp") - col("__y")) / col("__hn"))
      .withColumn("__h1n", col("__tpp") - col("__tp"))
      .withColumn("__d1n", (col("__ypp") - col("__yp")) / col("__h1n"))
      .withColumn("__h1m", col("__tm") - col("__tmm"))
      .withColumn("__d1m", (col("__ym") - col("__ymm")) / col("__h1m"))
    val hm = col("__hm"); val hn = col("__hn")
    val dm = col("__dm"); val dn = col("__dn")
    // one-sided three-point endpoint slope with scipy's two clamps
    def edge(h0: Column, h1: Column, m0: Column, m1: Column): Column = {
      val dRaw = ((lit(2.0) * h0 + h1) * m0 - h0 * m1) / (h0 + h1)
      when(signum(dRaw) =!= signum(m0), lit(0.0))
        .when(signum(m0) =!= signum(m1) && abs(dRaw) > lit(3.0) * abs(m0),
          lit(3.0) * m0)
        .otherwise(dRaw)
    }
    val interiorW1 = lit(2.0) * hn + hm
    val interiorW2 = hn + lit(2.0) * hm
    val slope =
      when(col("__tm").isNull && col("__tp").isNull, lit(0.0))
        .when(col("__tm").isNull && col("__tpp").isNull, dn) // n == 2
        .when(col("__tm").isNull, edge(hn, col("__h1n"), dn, col("__d1n")))
        .when(col("__tp").isNull && col("__tmm").isNull, dm) // n == 2
        .when(col("__tp").isNull, edge(hm, col("__h1m"), dm, col("__d1m")))
        .when((dm > 0 && dn > 0) || (dm < 0 && dn < 0),
          (interiorW1 + interiorW2) / (interiorW1 / dm + interiorW2 / dn))
        .otherwise(lit(0.0))
    hermiteEval(kn.withColumn("__d", slope), probes, by, t, w, toD, "v_pchip")
  }

  /** Shared cubic-Hermite tail for the local-slope interpolators (pchip /
    * akima): pair each knot with its successor, as-of join the probes,
    * evaluate the Hermite basis. Exact knot hits return the knot value;
    * outside the range -> NULL. */
  private def hermiteEval(knWithSlope: DataFrame, probes: DataFrame,
                          by: Seq[String], t: String,
                          w: org.apache.spark.sql.expressions.WindowSpec,
                          toD: Column => Column, outName: String): DataFrame = {
    val kn2 = knWithSlope
      .withColumn("__d1", lead("__d", 1).over(w))
      .select((by.map(col) :+ col("__t") :+ col("__t").as("__t0") :+
        col("__y").as("__y0") :+ col("__d").as("__d0") :+
        col("__tp").as("__t1") :+ col("__yp").as("__y1") :+
        col("__d1")): _*)
    val prb = probes.select((by.map(col) :+ toD(col(t)).as("__t")): _*)
    val joined = AsOf.backward(prb, kn2, by, "__t",
      Seq("__t0", "__y0", "__d0", "__t1", "__y1", "__d1"))
      .withColumn("__h", col("__t1") - col("__t0"))
      .withColumn("__s", (col("__t") - col("__t0")) / col("__h"))
      .withColumn("__om", lit(1.0) - col("__s"))
    val s = col("__s"); val om = col("__om"); val h = col("__h")
    val hermite =
      col("__y0") * ((lit(1.0) + lit(2.0) * s) * (om * om)) +
        (h * col("__d0")) * (s * (om * om)) +
        col("__y1") * ((s * s) * (lit(3.0) - lit(2.0) * s)) +
        (h * col("__d1")) * ((s * s) * (s - lit(1.0)))
    val out = when(col("__t0").isNull, lit(null))
      .when(col("__t") === col("__t0"), col("__y0"))
      .when(col("__t1").isNull, lit(null))
      .otherwise(hermite)
    joined.withColumn(outName, out)
      .select((by.map(col) :+ col("__t").as("t_probe") :+ col(outName)): _*)
  }

  /** interp(method="akima") (ref `core/missing.py:616` -> scipy
    * `Akima1DInterpolator`): slopes from the 4 surrounding secants with
    * virtual boundary secants extrapolated linearly (m_{-1} = 2m_0 - m_1
    * etc.). Like pchip this is LOCAL — window expressions only. The
    * default slope is the average of the outer secants; where the
    * oscillation weight f12 = |m3-m2| + |m1-m0| exceeds scipy's
    * data-dependent threshold 1e-9 * max(f12) (a per-series window max),
    * the Akima weighted form (f1*m1 + f2*m2)/f12 applies. Series with
    * n < 3 knots fall back to the secant (linear). */
  def interpAkima(series: DataFrame, probes: DataFrame, by: Seq[String],
                  t: String, v: String): DataFrame =
    interpAkimaLike(series, probes, by, t, v, makima = false, "v_akima")

  /** interp(method="makima"): the modified-Akima weights
    * w1 = |m3-m2| + |(m3+m2)/2|, w2 = |m1-m0| + |(m1+m0)/2| — no
    * data-dependent epsilon; both-secants-zero degenerates to slope 0. */
  def interpMakima(series: DataFrame, probes: DataFrame, by: Seq[String],
                   t: String, v: String): DataFrame =
    interpAkimaLike(series, probes, by, t, v, makima = true, "v_makima")

  private def interpAkimaLike(series: DataFrame, probes: DataFrame,
                              by: Seq[String], t: String, v: String,
                              makima: Boolean, outName: String): DataFrame = {
    val toD = tsToDouble(series, t)
    val w = Window.partitionBy(by.map(col): _*).orderBy(col("__t"))
    val wAll = Window.partitionBy(by.map(col): _*)
    val kn = series.select((by.map(col) :+ toD(col(t)).as("__t") :+
      col(v).cast("double").as("__y")): _*)
      .withColumn("__tp", lead("__t", 1).over(w))
      .withColumn("__yp", lead("__y", 1).over(w))
      .withColumn("__sp", (col("__yp") - col("__y")) / (col("__tp") - col("__t")))
      .withColumn("__sm", lag("__sp", 1).over(w))
      .withColumn("__spp", lead("__sp", 1).over(w))
      .withColumn("__smm", lag("__sp", 2).over(w))
      .withColumn("__n", count(lit(1)).over(wAll))
      // extended secants M0..M3 = m[i], m[i+1], m[i+2], m[i+3] in scipy's
      // 2-shifted indexing; virtuals fill the boundaries
      .withColumn("__M2",
        when(col("__sp").isNotNull, col("__sp"))
          .otherwise(lit(2.0) * col("__sm") - col("__smm")))
      .withColumn("__M1",
        when(col("__sm").isNotNull, col("__sm"))
          .otherwise(lit(2.0) * col("__sp") - col("__spp")))
      .withColumn("__M3",
        when(col("__spp").isNotNull, col("__spp"))
          .when(col("__sp").isNotNull, lit(2.0) * col("__sp") - col("__sm"))
          .otherwise(lit(2.0) * col("__M2") - col("__sm")))
      .withColumn("__M0",
        when(col("__smm").isNotNull, col("__smm"))
          .when(col("__sm").isNotNull, lit(2.0) * col("__sm") - col("__sp"))
          .otherwise(lit(2.0) * col("__M1") - col("__sp")))
      .withColumn("__f1",
        if (makima)
          abs(col("__M3") - col("__M2")) +
            abs((col("__M3") + col("__M2")) / lit(2.0))
        else abs(col("__M3") - col("__M2")))
      .withColumn("__f2",
        if (makima)
          abs(col("__M1") - col("__M0")) +
            abs((col("__M1") + col("__M0")) / lit(2.0))
        else abs(col("__M1") - col("__M0")))
      .withColumn("__f12", col("__f1") + col("__f2"))
      .withColumn("__f12max", max(col("__f12")).over(wAll))
    // akima uses scipy's data-dependent epsilon; makima has none (a zero
    // weight sum only happens when all four secants vanish -> slope 0)
    val weighted =
      (col("__f1") * col("__M1") + col("__f2") * col("__M2")) / col("__f12")
    val slope =
      if (makima)
        when(col("__n") < 3, coalesce(col("__sp"), col("__sm"), lit(0.0)))
          .when(col("__f12") === 0, lit(0.0))
          .otherwise(weighted)
      else
        when(col("__n") < 3, coalesce(col("__sp"), col("__sm"), lit(0.0)))
          .when(col("__f12") > lit(1e-9) * col("__f12max"), weighted)
          .otherwise(lit(0.5) * (col("__M3") + col("__M0")))
    hermiteEval(kn.withColumn("__d", slope), probes, by, t, w, toD, outName)
  }

  /** interp(method="polynomial", order=k): the reference forwards `order`
    * to interp1d's spline-of-order-k kind (`core/missing.py:616`), so
    * polynomial IS the parameterized spline family — dispatch to the
    * matching engine (0 zero, 1 linear, 2 quadratic, 3 cubic, 5 quintic). */
  def interpPolynomial(series: DataFrame, probes: DataFrame, by: Seq[String],
                       t: String, v: String, order: Int): DataFrame = order match {
    case 0 => interpZero(series, probes, by, t, v)
    case 1 => interpLinear(series, probes, by, t, v)
    case 2 => interpQuadratic(series, probes, by, t, v)
    case 3 => Spline.interpCubic(series, probes, by, t, v)
    case 5 => interpQuintic(series, probes, by, t, v)
    case k => throw new IllegalArgumentException(s"unsupported spline order $k")
  }

  /** interp(method="barycentric") (ref `core/missing.py:616` -> scipy
    * `barycentric_interpolate`): the GLOBAL polynomial through all series
    * knots in the numerically-stable barycentric form
    * p(x) = Σ w_j·y_j/(x−x_j) / Σ w_j/(x−x_j), w_j = 1/Π_{k≠j}(x_j−x_k).
    *
    * Spark shape: per-series sorted knot arrays (collect_list + array_sort)
    * carried on every probe row; weights and the two probe sums are LEFT
    * FOLDS over the sorted arrays (`aggregate`), which both engines
    * evaluate in identical order — bit-reproducible without decimal. Time
    * coords are rescaled to days so the weight products of an n-knot
    * series stay within double range (n ~ hundreds). O(n²) work per
    * series is inherent to the operator (every weight sees every knot). */
  def interpBarycentric(series: DataFrame, probes: DataFrame, by: Seq[String],
                        t: String, v: String): DataFrame = {
    val isTs = series.schema(t).dataType ==
      org.apache.spark.sql.types.TimestampType
    def toX(c: Column): Column =
      if (isTs) unix_micros(c).cast("double") / lit(86400e6)
      else c.cast("double")
    val wAll = Window.partitionBy(by.map(col): _*)
    val kn = series.select((by.map(col) :+ toX(col(t)).as("__x") :+
      col(v).cast("double").as("__y")): _*)
      .withColumn("__xsall", array_sort(collect_list("__x").over(wAll)))
      .withColumn("__w", lit(1.0) / aggregate(
        filter(col("__xsall"), e => e =!= col("__x")),
        lit(1.0), (acc, e) => acc * (col("__x") - e)))
    val arrs = kn.groupBy(by.map(col): _*).agg(
      array_sort(collect_list(struct(col("__x").as("x"), col("__y").as("y"),
        col("__w").as("w")))).as("__srt"))
      .select((by.map(col) :+
        transform(col("__srt"), s => s.getField("x")).as("__xs") :+
        transform(col("__srt"), s => s.getField("y")).as("__ys") :+
        transform(col("__srt"), s => s.getField("w")).as("__ws")): _*)
    val prb = probes.select((by.map(col) :+ col(t) :+ toX(col(t)).as("__x")): _*)
    val j = prb.join(arrs, by)
    val x = col("__x")
    val n = size(col("__xs"))
    val num = aggregate(sequence(lit(1), n), lit(0.0), (acc, i) =>
      acc + element_at(col("__ws"), i) / (x - element_at(col("__xs"), i)) *
        element_at(col("__ys"), i))
    val den = aggregate(sequence(lit(1), n), lit(0.0), (acc, i) =>
      acc + element_at(col("__ws"), i) / (x - element_at(col("__xs"), i)))
    val pos = array_position(col("__xs"), x)
    val out = when(x < element_at(col("__xs"), 1), lit(null))
      .when(x > element_at(col("__xs"), -1), lit(null))
      .when(pos > 0, element_at(col("__ys"), pos.cast("int")))
      .otherwise(num / den)
    j.withColumn("v_barycentric", out)
      .select((by.map(col) :+ col(t) :+ col("v_barycentric")): _*)
  }

  /** interp(method="krogh") (ref `core/missing.py:616` -> scipy
    * `krogh_interpolate`): polynomial interpolation in NEWTON form —
    * divided-difference coefficients per series, Horner evaluation per
    * probe. Same global-polynomial values as barycentric, but the Newton
    * float path is the one scipy's Krogh class takes (and it needs no
    * per-term division at eval time, so knot hits are exact by identity).
    *
    * The divided-difference table is a fold over levels carrying the
    * current level as an ARRAY (n-1 steps of an `aggregate` with a
    * struct(cur, coef) accumulator); evaluation folds indices n-1..1.
    * Left folds run in identical order in both engines. */
  def interpKrogh(series: DataFrame, probes: DataFrame, by: Seq[String],
                  t: String, v: String): DataFrame = {
    import org.apache.spark.sql.types.{ArrayType, IntegerType}
    val isTs = series.schema(t).dataType ==
      org.apache.spark.sql.types.TimestampType
    def toX(c: Column): Column =
      if (isTs) unix_micros(c).cast("double") / lit(86400e6)
      else c.cast("double")
    val kn = series.select((by.map(col) :+ toX(col(t)).as("__x") :+
      col(v).cast("double").as("__y")): _*)
    val arrs0 = kn.groupBy(by.map(col): _*).agg(
      array_sort(collect_list(struct(col("__x").as("x"), col("__y").as("y"))))
        .as("__srt"))
      .select((by.map(col) :+
        transform(col("__srt"), s => s.getField("x")).as("__xs") :+
        transform(col("__srt"), s => s.getField("y")).as("__ys")): _*)
    val n = size(col("__xs"))
    val emptyI = array().cast(ArrayType(IntegerType))
    val levels = when(n > 1, sequence(lit(1), n - 1)).otherwise(emptyI)
    val csExpr = aggregate(levels,
      struct(col("__ys").as("cur"),
        org.apache.spark.sql.functions.slice(col("__ys"), 1, 1).as("coef")),
      (acc, l) => {
        val nxt = transform(sequence(lit(1), n - l), i =>
          (element_at(acc.getField("cur"), i + 1) -
            element_at(acc.getField("cur"), i)) /
            (element_at(col("__xs"), i + l) - element_at(col("__xs"), i)))
        struct(nxt.as("cur"),
          concat(acc.getField("coef"),
            org.apache.spark.sql.functions.slice(nxt, 1, 1)).as("coef"))
      }).getField("coef")
    val arrs = arrs0.withColumn("__cs", csExpr)
    val prb = probes.select((by.map(col) :+ col(t) :+ toX(col(t)).as("__x")): _*)
    val j = prb.join(arrs, by)
    val x = col("__x")
    val seqD = when(n > 1, sequence(n - 1, lit(1), lit(-1))).otherwise(emptyI)
    val horner = aggregate(seqD, element_at(col("__cs"), n), (acc, b) =>
      acc * (x - element_at(col("__xs"), b)) + element_at(col("__cs"), b))
    val out = when(x < element_at(col("__xs"), 1), lit(null))
      .when(x > element_at(col("__xs"), -1), lit(null))
      .otherwise(horner)
    j.withColumn("v_krogh", out)
      .select((by.map(col) :+ col(t) :+ col("v_krogh")): _*)
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

  /** Degree-3 polyfit with covariance diagonal (ref `computation/fit.py:101`
    * polyfit `cov=True`; `Dataset.polyfit` returns polyfit_covariance =
    * σ²·inv(XᵀX)). Closed-form Cramer expansion over exact decimal Hankel
    * moments s0..s6 / t0..t3 / Σy², with FIXED association so the DuckDB
    * oracle replays bit-identical double arithmetic. Caller pre-scales x,y
    * into ~[0,1] (numpy polyfit's own conditioning advice). Returns
    * struct(c0..c3, v0..v3) for y ~ Σ cₖxᵏ, vₖ = Var(cₖ). */
  /** Expression algebra: the SAME combinator code below builds either the
    * Spark Column tree or the DuckDB SQL text for fit3cov, so engine and
    * oracle evaluate bit-identical IEEE-double arithmetic (identical
    * association, fully parenthesized). */
  private trait Alg[T] {
    def mul(a: T, b: T): T; def div(a: T, b: T): T
    def add(a: T, b: T): T; def sub(a: T, b: T): T
    def num(d: Double): T
  }
  private object ColAlg extends Alg[Column] {
    def mul(a: Column, b: Column) = a * b
    def div(a: Column, b: Column) = a / b
    def add(a: Column, b: Column) = a + b
    def sub(a: Column, b: Column) = a - b
    def num(d: Double) = lit(d)
  }
  private object SqlAlg extends Alg[String] {
    def mul(a: String, b: String) = s"($a * $b)"
    def div(a: String, b: String) = s"($a / $b)"
    def add(a: String, b: String) = s"($a + $b)"
    def sub(a: String, b: String) = s"($a - $b)"
    def num(d: Double) = s"CAST($d AS DOUBLE)"
  }

  /** Cramer-expansion deg-3 solve with covariance diagonal over the Hankel
    * moments s0..s6 / t0..t3 / Σy². Returns (c0..c3, v0..v3). */
  private def fit3covCore[T](sN: Seq[T], tN: Seq[T], syy: T)(F: Alg[T])
      : (Seq[T], Seq[T]) = {
    import F._
    def det3(a: Seq[Seq[T]]): T =
      add(sub(mul(a(0)(0), sub(mul(a(1)(1), a(2)(2)), mul(a(1)(2), a(2)(1)))),
              mul(a(0)(1), sub(mul(a(1)(0), a(2)(2)), mul(a(1)(2), a(2)(0))))),
          mul(a(0)(2), sub(mul(a(1)(0), a(2)(1)), mul(a(1)(1), a(2)(0)))))
    def minor(a: Seq[Seq[T]], i: Int, j: Int): Seq[Seq[T]] =
      a.indices.filter(_ != i).map(r => a.indices.filter(_ != j).map(c => a(r)(c)))
    def det4(a: Seq[Seq[T]]): T =
      sub(add(sub(mul(a(0)(0), det3(minor(a, 0, 0))),
                  mul(a(0)(1), det3(minor(a, 0, 1)))),
              mul(a(0)(2), det3(minor(a, 0, 2)))),
          mul(a(0)(3), det3(minor(a, 0, 3))))
    val A = (0 to 3).map(i => (0 to 3).map(j => sN(i + j)))
    val det = det4(A)
    val cs = (0 to 3).map { k =>
      div(det4((0 to 3).map(i => (0 to 3).map(j => if (j == k) tN(i) else A(i)(j)))), det)
    }
    val rss = sub(syy,
      add(add(add(mul(cs(0), tN(0)), mul(cs(1), tN(1))), mul(cs(2), tN(2))),
          mul(cs(3), tN(3))))
    val sigma2 = div(rss, sub(sN(0), num(4.0)))
    val vs = (0 to 3).map(k => div(mul(sigma2, det3(minor(A, k, k))), det))
    (cs, vs)
  }

  /** The 12 aggregate deg-3 Hankel moment columns, named s0..s6 / t0..t3
    * / syy. Kept separate from the solve so the hash-agg stage stays small
    * enough for whole-stage codegen; the Cramer solve is then a projection
    * over the (tiny, one-row-per-group) aggregated frame. */
  def fit3covMoments(x: Column, y: Column): Seq[Column] = {
    val mask = x.isNotNull && y.isNotNull
    def m(c: Column) = when(mask, c)
    val xs = Seq(x, x * x, x * x * x, x * x * x * x, x * x * x * x * x,
      x * x * x * x * x * x)
    (count(m(lit(1))).cast("double").as("s0") +:
      xs.zipWithIndex.map { case (p, i) => dsum(m(p), 9).as(s"s${i + 1}") }) ++
      Seq(dsum(m(y), 9).as("t0"), dsum(m(x * y), 9).as("t1"),
        dsum(m(x * x * y), 9).as("t2"), dsum(m(x * x * x * y), 9).as("t3"),
        dsum(m(y * y), 9).as("syy"))
  }

  /** Cramer solve over moment columns named as in [[fit3covMoments]]:
    * struct(c0..c3, v0..v3). */
  def fit3covSolve: Column = {
    val (cs, vs) = fit3covCore((0 to 6).map(k => col(s"s$k")),
      (0 to 3).map(k => col(s"t$k")), col("syy"))(ColAlg)
    struct(cs.zipWithIndex.map { case (c, k) => c.as(s"c$k") } ++
      vs.zipWithIndex.map { case (v, k) => v.as(s"v$k") }: _*)
  }

  // NOTE: there is deliberately NO one-shot moments+solve aggregate
  // expression here: folding the Cramer expansion into the aggregate's
  // result expressions generates a hashAgg output method past janino's
  // 64 KB limit and Spark silently falls back to interpreted execution
  // (the round-16 verdict finding). The split keeps the hot per-row
  // stage codegen'd; the solve runs over one row per group.

  /** DuckDB oracle fragment for the deg-3 solve: the coefficient / variance
    * SELECT expressions over moment columns named s0..s6, t0..t3, syy —
    * generated by the same combinator code as the Column tree, so the
    * double arithmetic replays bit-identically. */
  def fit3covSqlExprs: (Seq[String], Seq[String]) =
    fit3covCore((0 to 6).map(k => s"s$k"), (0 to 3).map(k => s"t$k"), "syy")(SqlAlg)

  /** Arbitrary-degree polyfit: one aggregation pass builds the decimal
    * Vandermonde moments per group (map-side combine, scale-safe), then a
    * per-group O(deg³) Gauss-Jordan solve on the already-aggregated row —
    * the same flox-style "moments then tiny solve" split as fit2/fit3cov,
    * generalized. Returns (coeffs array ASCENDING power c0..c_deg — note
    * the reference emits descending degree — and the covariance diagonal
    * σ²·diag(inv(XᵀX)), the reference's polyfit_covariance diagonal).
    * Rank-deficient moment matrices (constant x, duplicated x) and groups
    * with fewer than deg+1 points return NULL, mirroring the reference's
    * "number of data points must exceed order" lstsq guard. */
  def polyfitMoments(df: DataFrame, by: Seq[String], x: Column, y: Column,
                     deg: Int): DataFrame = {
    require(deg >= 1 && deg <= 12, s"degree $deg out of range")
    val mask = x.isNotNull && y.isNotNull
    def m(c: Column) = when(mask, c)
    def pow(k: Int): Column = (1 to k).foldLeft(lit(1.0): Column)((a, _) => a * x)
    val sAgg = (0 to 2 * deg).map {
      case 0 => count(m(lit(1))).cast("double").as("s0")
      case k => dsum(m(pow(k)), 9).as(s"s$k")
    }
    val tAgg = (0 to deg).map(k => dsum(m(pow(k) * y), 9).as(s"t$k"))
    val agg = df.groupBy(by.map(col): _*)
      .agg(sAgg.head, (sAgg.tail ++ tAgg :+ dsum(m(y * y), 9).as("syy")): _*)
    val solve = udf { (s: Seq[Double], t: Seq[Double], syy: Double) =>
      val d = t.length // deg+1
      if (s(0) <= d) Option.empty[(Seq[Double], Seq[Double])] // n must exceed order
      else {
        // Gauss-Jordan with partial pivoting on [A | t | I]
        val a = Array.tabulate(d, 2 * d + 1) { (i, j) =>
          if (j < d) s(i + j) else if (j == d) t(i)
          else if (j - d - 1 == i) 1.0 else 0.0
        }
        // Rank-deficiency threshold relative to the matrix magnitude (the
        // reference's lstsq handles this via SVD rcond; a pivot this small
        // would only produce NaN/Inf garbage here).
        val eps = s.map(math.abs).max * 1e-12
        var singular = false
        for (col0 <- 0 until d if !singular) {
          val p = (col0 until d).maxBy(r => math.abs(a(r)(col0)))
          val tmp = a(col0); a(col0) = a(p); a(p) = tmp
          val piv = a(col0)(col0)
          if (math.abs(piv) <= eps) singular = true
          else {
            for (j <- col0 to 2 * d) a(col0)(j) /= piv
            for (r <- 0 until d if r != col0) {
              val f = a(r)(col0)
              if (f != 0.0) for (j <- col0 to 2 * d) a(r)(j) -= f * a(col0)(j)
            }
          }
        }
        if (singular) Option.empty[(Seq[Double], Seq[Double])]
        else {
          val coef = Array.tabulate(d)(i => a(i)(d))
          val invDiag = Array.tabulate(d)(i => a(i)(d + 1 + i))
          val rss = syy - coef.indices.map(i => coef(i) * t(i)).sum
          val sigma2 = rss / (s(0) - d)
          Some((coef.toSeq, invDiag.map(_ * sigma2).toSeq))
        }
      }
    }
    val sArr = array((0 to 2 * deg).map(k => col(s"s$k")): _*)
    val tArr = array((0 to deg).map(k => col(s"t$k")): _*)
    agg.withColumn("__fit", solve(sArr, tArr, col("syy")))
      .select(by.map(col) :+ col("__fit._1").as("coeffs") :+
        col("__fit._2").as("cov_diag"): _*)
  }

  /** interpolate_na: fill interior NULL runs by linear interpolation
    * between bracketing valid values (ref `core/missing.py:331`
    * `interp_na`); edges stay NULL like the reference default. */
  def interpolateNa(df: DataFrame, by: Seq[Column], order: Seq[Column],
                    t: Column, v: String, limit: Option[Int] = None,
                    maxGap: Option[Double] = None): DataFrame = {
    def wAsc = Window.partitionBy(by: _*).orderBy(order: _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    def wDesc = Window.partitionBy(by: _*).orderBy(order.map(_.desc): _*)
      .rowsBetween(Window.unboundedPreceding, 0)
    // limit= needs row ordinals; materialize them first (window functions
    // can't nest inside another window's argument in one projection)
    val rnCol = "__interp_rn"
    val df1 = if (limit.isDefined)
      df.withColumn(rnCol,
        row_number().over(Window.partitionBy(by: _*).orderBy(order: _*)))
    else df
    val y0 = last(col(v), ignoreNulls = true).over(wAsc)
    val t0 = last(when(col(v).isNotNull, t), ignoreNulls = true).over(wAsc)
    val y1 = last(col(v), ignoreNulls = true).over(wDesc)
    val t1 = last(when(col(v).isNotNull, t), ignoreNulls = true).over(wDesc)
    val tD = t.cast("double")
    // ref `core/missing.py:331` limit: fill only NaNs within `limit` rows
    // of the previous valid observation (leading part of each run);
    // `:48` max_gap: ALL-or-nothing per run, gap length measured in
    // coordinate units between the bracketing valid points.
    val allow = Seq(
      limit.map { l =>
        val lastValidRn = last(when(col(v).isNotNull, col(rnCol)),
          ignoreNulls = true).over(wAsc)
        col(rnCol) - lastValidRn <= l
      },
      maxGap.map(g => t1.cast("double") - t0.cast("double") <= g)
    ).flatten.reduceOption(_ && _).getOrElse(lit(true))
    val filled = when(col(v).isNotNull, col(v))
      .when(y0.isNull || y1.isNull, lit(null))
      .when(!allow, lit(null))
      .when(t1.cast("double") === t0.cast("double"), y0)
      .otherwise(y0 + (y1 - y0) * (tD - t0.cast("double")) /
        (t1.cast("double") - t0.cast("double")))
    df1.withColumn(v + "_interp", filled).drop(rnCol)
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
