package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._

/** Content-defined chunking boundaries (the storage-dedup / incremental-
  * corpus-dedup primitive: FastCDC/LBFS lineage — chunk cuts follow the
  * CONTENT, so an insertion early in a document shifts only the chunks it
  * touches, unlike fixed-size blocks).
  *
  * Basic rolling-polynomial CDC over code points: at position p >= w-1
  * the window hash H(p) = Σ_{j<w} code(p-j)·B^j mod P cuts AFTER p when
  * H(p) % D == 0; the final chunk always ends at the string end. No
  * min/max clamps — the plain textbook rule keeps the DuckDB oracle an
  * exact replay (an 8-term sum per position, B^j literals).
  *
  * The incremental update h' = (h·B + c_in − c_out·B^w) mod P is exact
  * Long arithmetic: P = 2^31−1 (the repo's Carter-Wegman modulus), so
  * every intermediate stays < 2^62. Returns array<struct<start,len>> of
  * [start, start+len) code-point spans (0-based; `substring`-ready as
  * start+1 with 1-based SQL).
  */
case class CdcChunks(child: Expression, w: Int, b: Long, d: Long)
  extends UnaryExpression {

  private val P = 2147483647L // 2^31 - 1
  require(w >= 2 && w <= 64, s"window $w out of range")
  require(b > 1 && b < P && d > 1, "bad CDC parameters")

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("start", IntegerType, nullable = false),
    StructField("len", IntegerType, nullable = false))), containsNull = false)

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].toString
    val cps = s.codePoints().toArray
    val n = cps.length
    // B^w mod P for the outgoing term
    var bw = 1L
    var i = 0
    while (i < w) { bw = bw * b % P; i += 1 }
    val cuts = scala.collection.mutable.ArrayBuffer.empty[Int]
    var h = 0L
    i = 0
    while (i < n) {
      h = (h * b + cps(i) % P) % P
      if (i >= w) h = ((h - cps(i - w) % P * bw) % P + P) % P
      if (i >= w - 1 && h % d == 0L) cuts += (i + 1)
      i += 1
    }
    if (cuts.isEmpty || cuts.last != n) cuts += n
    val out = new Array[Any](cuts.length)
    var start = 0
    i = 0
    while (i < cuts.length) {
      out(i) = InternalRow(start, cuts(i) - start)
      start = cuts(i)
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val cps = ctx.freshName("cps"); val n = ctx.freshName("n")
      val bw = ctx.freshName("bw"); val h = ctx.freshName("h")
      val i = ctx.freshName("i"); val cuts = ctx.freshName("cuts")
      val out = ctx.freshName("out"); val start = ctx.freshName("start")
      s"""
         |int[] $cps = $c.toString().codePoints().toArray();
         |int $n = $cps.length;
         |long $bw = 1L;
         |for (int $i = 0; $i < $w; $i++) $bw = $bw * ${b}L % ${P}L;
         |java.util.ArrayList $cuts = new java.util.ArrayList();
         |long $h = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  $h = ($h * ${b}L + $cps[$i] % ${P}L) % ${P}L;
         |  if ($i >= $w) $h = (($h - $cps[$i - $w] % ${P}L * $bw) % ${P}L + ${P}L) % ${P}L;
         |  if ($i >= $w - 1 && $h % ${d}L == 0L) $cuts.add(Integer.valueOf($i + 1));
         |}
         |if ($cuts.isEmpty() ||
         |    ((Integer) $cuts.get($cuts.size() - 1)).intValue() != $n) {
         |  $cuts.add(Integer.valueOf($n));
         |}
         |Object[] $out = new Object[$cuts.size()];
         |int $start = 0;
         |for (int $i = 0; $i < $cuts.size(); $i++) {
         |  int __e = ((Integer) $cuts.get($i)).intValue();
         |  $out[$i] = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
         |    new Object[]{Integer.valueOf($start), Integer.valueOf(__e - $start)});
         |  $start = __e;
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression) =
    copy(child = newChild)
  override def prettyName: String = "cdc_chunks"
}

object CdcExprs {
  /** Default geometry: window 8, base 131, cut mask 64 (~64-cp chunks). */
  def cdcChunks(text: Column, w: Int = 8, b: Long = 131L,
                d: Long = 64L): Column =
    GraftBridge.column(CdcChunks(GraftBridge.expression(text), w, b, d))
}
