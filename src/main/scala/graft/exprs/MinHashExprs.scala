package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native MinHash kernel: given the per-shingle hashes (longs in
  * [0, 2^31-1)), compute all k Carter-Wegman minima `min_s (a_j*h_s + b_j)
  * mod (2^31-1)` in ONE pass over the array.
  *
  * The declarative formulation — k × `array_min(transform(...))` —
  * evaluates its lambdas interpreted, one call per (shingle, hash fn):
  * ~64M virtual calls for 10k docs × 100 shingles × 64 fns. This
  * expression runs the same arithmetic as a j-unrolled Java loop inside
  * WholeStageCodegen (build-brief preference (b): native Expression with
  * doGenCode). Products stay < 2^62, ANSI-safe.
  */
case class MinHashCW(child: Expression, as: Array[Long], bs: Array[Long])
  extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements(); val k = as.length
    val out = new Array[Long](k)
    java.util.Arrays.fill(out, Long.MaxValue)
    var i = 0
    while (i < n) {
      val h = arr.getLong(i)
      var j = 0
      while (j < k) {
        val v = (h * as(j) + bs(j)) % P
        if (v < out(j)) out(j) = v
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val aRef = ctx.addReferenceObj("mhAs", as, "long[]")
      val bRef = ctx.addReferenceObj("mhBs", bs, "long[]")
      val n = ctx.freshName("n"); val k = ctx.freshName("k")
      val out = ctx.freshName("out"); val i = ctx.freshName("i")
      val j = ctx.freshName("j"); val h = ctx.freshName("h")
      val v = ctx.freshName("v")
      s"""
         |int $n = $c.numElements();
         |int $k = $aRef.length;
         |long[] $out = new long[$k];
         |java.util.Arrays.fill($out, Long.MAX_VALUE);
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = $c.getLong($i);
         |  for (int $j = 0; $j < $k; $j++) {
         |    long $v = ($h * $aRef[$j] + $bRef[$j]) % ${P}L;
         |    if ($v < $out[$j]) $out[$j] = $v;
         |  }
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
}

object MinHashExprs {
  import org.apache.spark.sql.GraftBridge

  /** Column form over a pre-hashed shingle array. */
  def minhashCW(hashes: Column, as: Array[Long], bs: Array[Long]): Column =
    GraftBridge.column(MinHashCW(GraftBridge.expression(hashes), as, bs))
}
