package graft.exprs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact quantiles with all nine Hyndman & Fan methods (ref
  * `xarray/core/variable.py:1929` quantile -> `np.quantile(method=...)`;
  * numpy's interpolation parameter).
  *
  * Spark's builtin `percentile` implements only linear (H&F 7); the other
  * eight need a custom aggregate. Implemented as a typed [[Aggregator]]
  * (collect + sort in `finish`): the buffer spills through Spark's
  * aggregation machinery, and per-group cardinality bounds memory. For
  * full-column quantiles at 100 TB prefer `approx_percentile` or a
  * t-digest sketch; exact H&F is for grouped quantiles with bounded groups
  * (the reference's own use case — it materializes the axis in memory too).
  */
class HFQuantile(q: Double, method: Int)
  extends Aggregator[java.lang.Double, List[Double], java.lang.Double] {

  def zero: List[Double] = Nil

  def reduce(b: List[Double], x: java.lang.Double): List[Double] =
    if (x != null) x.doubleValue :: b else b // skipna: NULLs never enter

  def merge(a: List[Double], b: List[Double]): List[Double] = a ::: b

  def finish(b: List[Double]): java.lang.Double = {
    if (b.isEmpty) return null
    val x = b.toArray; java.util.Arrays.sort(x)
    val n = x.length
    def at(k: Int): Double = x(math.min(math.max(k, 1), n) - 1) // 1-based, clamped
    def lerp(h: Double): Double = {
      val fl = math.floor(h)
      at(fl.toInt) + (h - fl) * (at(fl.toInt + 1) - at(fl.toInt))
    }
    method match {
      case 1 => // inverse ECDF
        at(math.ceil(n * q).toInt)
      case 2 => // inverse ECDF with averaging at discontinuities
        val nq = n * q
        if (nq == math.floor(nq)) (at(nq.toInt) + at(nq.toInt + 1)) / 2.0
        else at(math.ceil(nq).toInt)
      case 3 => // nearest even order statistic
        val h = n * q - 0.5
        val r = math.rint(h) // half-to-even like numpy
        at(math.max(r, 0.0).toInt + 1)
      case 4 => lerp(n * q)
      case 5 => lerp(n * q + 0.5)
      case 6 => lerp((n + 1) * q)
      case 7 => lerp((n - 1) * q + 1)            // numpy/pandas default
      case 8 => lerp((n + 1.0 / 3.0) * q + 1.0 / 3.0)
      case 9 => lerp((n + 0.25) * q + 0.375)
    }
  }

  // a NATIVE list encoder (ArrayType(Double) in the agg buffer), not
  // kryo: Tungsten-serializable, and independent of --add-opens flags
  def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder[List[Double]]()
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object HFQuantile {
  /** Column form: `hfQuantile(col, 0.5, method = 4)`. */
  def apply(c: Column, q: Double, method: Int): Column =
    udaf(new HFQuantile(q, method)).apply(c)

  /** Vectorized-q form (ref `variable.py:1929` accepts an array of q):
    * one buffer, ONE sort, all quantiles read off the same order
    * statistics — amortizes the O(n log n) per group across the q's. */
  def multi(c: Column, qs: Seq[Double], method: Int): Column =
    udaf(new HFQuantileMulti(qs, method)).apply(c)
}

/** Array-q variant of [[HFQuantile]]: same buffer and methods, the finish
  * sorts once and evaluates every q. Returns NULL for an empty group,
  * else an array aligned with `qs`. */
class HFQuantileMulti(qs: Seq[Double], method: Int)
  extends Aggregator[java.lang.Double, List[Double], Array[Double]] {

  def zero: List[Double] = Nil

  def reduce(b: List[Double], x: java.lang.Double): List[Double] =
    if (x != null) x.doubleValue :: b else b

  def merge(a: List[Double], b: List[Double]): List[Double] = a ::: b

  def finish(b: List[Double]): Array[Double] = {
    if (b.isEmpty) return null
    val x = b.toArray; java.util.Arrays.sort(x)
    val n = x.length
    def at(k: Int): Double = x(math.min(math.max(k, 1), n) - 1)
    def lerp(h: Double): Double = {
      val fl = math.floor(h)
      at(fl.toInt) + (h - fl) * (at(fl.toInt + 1) - at(fl.toInt))
    }
    qs.map { q =>
      method match {
        case 1 => at(math.ceil(n * q).toInt)
        case 2 =>
          val nq = n * q
          if (nq == math.floor(nq)) (at(nq.toInt) + at(nq.toInt + 1)) / 2.0
          else at(math.ceil(nq).toInt)
        case 3 =>
          val h = n * q - 0.5
          at(math.max(math.rint(h), 0.0).toInt + 1)
        case 4 => lerp(n * q)
        case 5 => lerp(n * q + 0.5)
        case 6 => lerp((n + 1) * q)
        case 7 => lerp((n - 1) * q + 1)
        case 8 => lerp((n + 1.0 / 3.0) * q + 1.0 / 3.0)
        case 9 => lerp((n + 0.25) * q + 0.375)
      }
    }.toArray
  }

  def bufferEncoder: Encoder[List[Double]] = ExpressionEncoder[List[Double]]()
  def outputEncoder: Encoder[Array[Double]] = ExpressionEncoder[Array[Double]]()
}

/** Weighted quantile, H&F type-7 generalized to weights (ref
  * `computation/weighted.py:319` `_weighted_quantile`): the quantile of the
  * weighted ECDF with plotting positions (c_i - w_i q) / (W - w_1 ... ),
  * matching the reference's default `linear` interpolation on normalized
  * cumulative weights. */
class WeightedQuantile(q: Double)
  extends Aggregator[(java.lang.Double, java.lang.Double),
    List[(Double, Double)], java.lang.Double] {

  def zero: List[(Double, Double)] = Nil
  def reduce(b: List[(Double, Double)],
             x: (java.lang.Double, java.lang.Double)): List[(Double, Double)] =
    if (x._1 != null && x._2 != null && x._2.doubleValue > 0)
      (x._1.doubleValue, x._2.doubleValue) :: b
    else b
  def merge(a: List[(Double, Double)], b: List[(Double, Double)]) = a ::: b
  def finish(b: List[(Double, Double)]): java.lang.Double = {
    if (b.isEmpty) return null
    // sort by (value, weight): ties in value are ordered deterministically
    // so the plotting positions don't depend on partition arrival order
    val s = b.sortBy(x => (x._1, x._2)).toArray
    val w = s.map(_._2); val v = s.map(_._1)
    val totW = w.sum
    // xarray weighted type-7 plotting positions: h_i = (c_i - w_i) / (W - w_i)
    // degenerates to (i)/(n-1) for unit weights
    val c = w.scanLeft(0.0)(_ + _).tail
    val h = c.indices.map(i =>
      if (totW == w(i)) 0.0 else (c(i) - w(i)) / (totW - w(i)))
    if (q <= h.head) return v.head
    if (q >= h.last) return v.last
    val j = h.lastIndexWhere(_ <= q)
    val (h0, h1) = (h(j), h(j + 1))
    if (h1 == h0) v(j) else v(j) + (q - h0) / (h1 - h0) * (v(j + 1) - v(j))
  }
  def bufferEncoder: Encoder[List[(Double, Double)]] =
    ExpressionEncoder[List[(Double, Double)]]()
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object WeightedQuantile {
  def apply(v: Column, w: Column, q: Double): Column =
    udaf(new WeightedQuantile(q)).apply(v, w)
}
