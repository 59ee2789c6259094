package graft.exprs

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Exact integer product aggregate (xarray `prod`, ref `_aggregations.py`).
  *
  * Spark has no product aggregate; the exp(sum(log)) rewrite carries ~1e-9
  * relative error (libm log/exp are not correctly rounded). For inputs that
  * are small exact integers (e.g. fixed-point-quantized factors) a Long
  * product is exact and order-independent. NULLs are skipped (skipna). */
class ProductLong extends Aggregator[java.lang.Long, Long, java.lang.Long] {
  def zero: Long = 1L
  def reduce(b: Long, x: java.lang.Long): Long =
    if (x == null) b else b * x.longValue
  def merge(a: Long, b: Long): Long = a * b
  def finish(b: Long): java.lang.Long = b
  def bufferEncoder: Encoder[Long] = Encoders.scalaLong
  def outputEncoder: Encoder[java.lang.Long] = Encoders.LONG
}

object ProductAgg {
  def productLong(c: Column): Column = udaf(new ProductLong).apply(c)
}
