package graft.exprs

import java.math.{BigInteger, RoundingMode}

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** One-pass outer-product second-moment aggregate for PCA covariance
  * ([[graft.llm.Pca.covariance]]).
  *
  * Replaces the posexplode formulation — which materializes n·(d+1)(d+2)/2
  * rows before the hash aggregate — with a single scan whose per-row work
  * is a tight upper-triangle loop, and whose shuffle payload is one
  * fixed-size buffer per partition (2·T longs, T = (d+1)(d+2)/2 cells;
  * 34 KB at d=64, 2.1 MB at d=512). At d=512 the explode path would build
  * ~132k rows per input row; this builds none — the win grows as d².
  *
  * EXACTNESS CONTRACT (must stay bit-identical to the explode path and
  * the DuckDB oracle): each product x_i·x_j is an exact double (24+24 <
  * 53 mantissa bits, homogeneous 1.0 included), and is quantized to the
  * DECIMAL(30,12) grid exactly as Spark's double→decimal cast does —
  * `BigDecimal.valueOf` (shortest decimal repr) then HALF_UP at scale 12
  * — then summed as an exact 128-bit integer of 1e-12 units (order-
  * independent). eval() rebuilds DECIMAL(30,12) from the 128-bit unscaled
  * sum, so the result equals `sum(cast(p as decimal(30,12)))` cell for
  * cell.
  *
  * Bounds: a single product's unscaled value must fit a long
  * (|p| ≤ 9.2e6 — embedding coordinates are O(1); violated input throws
  * loudly via longValueExact). The 128-bit cell sum overflows at ~1.7e26
  * quantized units ≈ 1.7e14 rows of max-magnitude products — not
  * reachable. Output rows are (i, j, s2) structs for i ≤ j ≤ d (the
  * homogeneous row/col carries first moments and the count), ready for
  * `inline`.
  */
case class CovMoments(
    child: Expression,
    d: Int,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val T = (d + 1) * (d + 2) / 2

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, nullable = false),
    StructField("j", IntegerType, nullable = false),
    StructField("s2", DecimalType(30, 12), nullable = false))),
    containsNull = false)

  override def createAggregationBuffer(): Array[Long] = new Array[Long](2 * T)

  // 128-bit signed add of v (sign-extended) into buf[2k] (hi) / buf[2k+1] (lo)
  private def add128(buf: Array[Long], k: Int, v: Long): Unit = {
    val lo = buf(2 * k + 1)
    val newLo = lo + v
    val carry = (((lo & v) | ((lo | v) & ~newLo)) >>> 63)
    buf(2 * k) += (v >> 63) + carry
    buf(2 * k + 1) = newLo
  }

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      require(arr.numElements() == d,
        s"CovMoments expects vectors of length $d, got ${arr.numElements()}")
      // x(0..d-1) = vector, x(d) = homogeneous 1.0
      val x = new Array[Double](d + 1)
      var i = 0
      while (i < d) { x(i) = arr.getFloat(i).toDouble; i += 1 }
      x(d) = 1.0
      var cell = 0
      i = 0
      while (i <= d) {
        val xi = x(i)
        var j = i
        while (j <= d) {
          val p = xi * x(j)
          // identical to Spark's Cast(double -> decimal(30,12)):
          // shortest-repr BigDecimal, then HALF_UP to scale 12
          val unscaled = java.math.BigDecimal.valueOf(p)
            .setScale(12, RoundingMode.HALF_UP).unscaledValue().longValueExact()
          add128(buf, cell, unscaled)
          cell += 1
          j += 1
        }
        i += 1
      }
    }
    buf
  }

  override def merge(buf: Array[Long], other: Array[Long]): Array[Long] = {
    var k = 0
    while (k < T) {
      // 128-bit add of other's (hi, lo) pair into buf
      val lo = buf(2 * k + 1); val olo = other(2 * k + 1)
      val newLo = lo + olo
      val carry = (((lo & olo) | ((lo | olo) & ~newLo)) >>> 63)
      buf(2 * k) += other(2 * k) + carry
      buf(2 * k + 1) = newLo
      k += 1
    }
    buf
  }

  override def eval(buf: Array[Long]): Any = {
    val out = new Array[Any](T)
    var cell = 0
    var i = 0
    while (i <= d) {
      var j = i
      while (j <= d) {
        val hi = buf(2 * cell); val lo = buf(2 * cell + 1)
        val big = BigInteger.valueOf(hi).shiftLeft(64)
          .add(new BigInteger(java.lang.Long.toUnsignedString(lo)))
        val dec = org.apache.spark.sql.types.Decimal(
          new java.math.BigDecimal(big, 12), 30, 12)
        out(cell) = InternalRow(i, j, dec)
        cell += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(8 * buf.length)
    bb.asLongBuffer().put(buf)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val out = new Array[Long](bytes.length / 8)
    java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
    out
  }

  override def withNewMutableAggBufferOffset(newOffset: Int): CovMoments =
    copy(mutableAggBufferOffset = newOffset)
  override def withNewInputAggBufferOffset(newOffset: Int): CovMoments =
    copy(inputAggBufferOffset = newOffset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovMoments =
    copy(child = newChildren.head)
  override def prettyName: String = "cov_moments"
}

object CovMomentsAgg {
  /** Upper-triangle homogeneous second moments of a float-vector column:
    * one aggregated row holding array<struct<i,j,s2:decimal(30,12)>>. */
  def covMoments(vec: Column, d: Int): Column =
    GraftBridge.column(
      CovMoments(GraftBridge.expression(vec), d).toAggregateExpression())
}
