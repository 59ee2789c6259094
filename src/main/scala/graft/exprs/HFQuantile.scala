package graft.exprs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf
import scala.collection.mutable.ArrayBuffer

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
  extends Aggregator[java.lang.Double, ArrayBuffer[Double], java.lang.Double] {

  def zero: ArrayBuffer[Double] = ArrayBuffer.empty

  def reduce(b: ArrayBuffer[Double], x: java.lang.Double): ArrayBuffer[Double] = {
    if (x != null) b += x.doubleValue   // skipna: NULLs never enter the buffer
    b
  }

  def merge(a: ArrayBuffer[Double], b: ArrayBuffer[Double]): ArrayBuffer[Double] = a ++= b

  def finish(b: ArrayBuffer[Double]): java.lang.Double = {
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

  def bufferEncoder: Encoder[ArrayBuffer[Double]] = Encoders.kryo[ArrayBuffer[Double]]
  def outputEncoder: Encoder[java.lang.Double] = Encoders.DOUBLE
}

object HFQuantile {
  /** Column form: `hfQuantile(col, 0.5, method = 4)`. */
  def apply(c: Column, q: Double, method: Int): Column =
    udaf(new HFQuantile(q, method)).apply(c)
}
