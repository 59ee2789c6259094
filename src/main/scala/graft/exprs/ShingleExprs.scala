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

object ShingleExprs {
  import org.apache.spark.sql.GraftBridge

  /** Distinct hashed k-shingles of a pre-tokenized array column. */
  def shingleHashes(tokens: Column, k: Int): Column =
    GraftBridge.column(ShingleHashes(GraftBridge.expression(tokens), k))
}
