package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native k-shingle hasher: token array in, DISTINCT 64-bit shingle ids
  * out, in one pass per document.
  *
  * Byte-identical to the declarative chain
  * `array_distinct(transform(seq, i => array_join(slice(toks,i+1,k)," ")))`
  * followed by `transform(_, xxhash64)`: shingles are the same
  * space-joined UTF-8 strings hashed with the same XXH64 (seed 42), only
  * the per-shingle expression-tree evaluation (slice + join + hash, all
  * interpreted) collapses into a compiled loop. CodegenFallback: one
  * virtual call per ROW, not per shingle — the loop body is the win. */
case class ShingleHashes(child: Expression, k: Int)
  extends UnaryExpression with CodegenFallback {

  private val space = UTF8String.fromString(" ")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val m = math.max(n - k + 1, 1)
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m)
    var cnt = 0
    var i = 0
    while (i < m) {
      val end = math.min(i + k, n)
      val parts = new Array[UTF8String](end - i)
      var j = i
      while (j < end) { parts(j - i) = arr.getUTF8String(j); j += 1 }
      val s = UTF8String.concatWs(space, parts: _*)
      val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset,
        s.numBytes, 42L)
      if (seen.add(h)) { out(cnt) = h; cnt += 1 }
      i += 1
    }
    new GenericArrayData(if (cnt == m) out else java.util.Arrays.copyOf(out, cnt))
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

/** Native 60-bit SimHash: per-document signature in ONE pass over the
  * token array — per-token md5 (same bytes as Spark's `md5(string)`),
  * the first 15 hex digits as a 60-bit hash (same value as
  * `conv(substring(md5(tok),1,15),16,10)`), ±1 votes per bit, sign
  * vector as the signature. Replaces the declarative explode + 60
  * conditional sums + per-doc hash agg — no shuffle at all, the
  * signature is a projection. */
case class SimHash60(child: Expression)
  extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType

  @transient private lazy val md =
    java.security.MessageDigest.getInstance("MD5")

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val votes = new Array[Int](60)
    var i = 0
    while (i < n) {
      md.reset()
      val d = md.digest(arr.getUTF8String(i).getBytes)
      // first 15 hex chars = bytes 0..6 plus the high nibble of byte 7
      var h = 0L
      var b = 0
      while (b < 7) { h = (h << 8) | (d(b) & 0xffL); b += 1 }
      h = (h << 4) | ((d(7) & 0xffL) >>> 4)
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) { if (votes(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object ShingleExprs {
  import org.apache.spark.sql.GraftBridge

  /** Distinct hashed k-shingles of a pre-tokenized array column. */
  def shingleHashes(tokens: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), k))

  /** One-pass 60-bit simhash of a pre-tokenized array column. */
  def simhash60(tokens: Column): Column =
    GraftBridge.column(SimHash60(GraftBridge.expression(tokens)))
}
