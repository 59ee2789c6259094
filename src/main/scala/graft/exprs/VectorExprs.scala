package graft.exprs

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{AbstractDataType, ArrayType, DataType, DoubleType, FloatType}
import org.apache.spark.sql.functions.col

/** Native Catalyst expression for float-vector dot products — the hot inner
  * loop of embedding similarity search (SURVEY.md llm/ mandate).
  *
  * `zip_with` + `aggregate` evaluate their lambdas interpreted, one
  * function call per element; this expression generates a tight Java loop
  * over the two float arrays inside WholeStageCodegen (preference order
  * (b) of the build brief: native `Expression` with `doGenCode` over UDF).
  * Accumulation is double, sequential — deterministic for a given array.
  */
case class DotProductF32(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += (double) $a.getFloat($i) * (double) $b.getFloat($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Double-array variant of [[DotProductF32]] — same sequential-fold
  * semantics (bit-identical to `aggregate(zip_with(a,b,*), 0d, +)` and to a
  * SQL `list_reduce` replay), for pipelines whose vectors are already
  * double (e.g. unit-normalized embeddings in SemDeDup). */
case class DotProductF64(left: Expression, right: Expression)
  extends BinaryExpression {

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) { acc += x.getDouble(i) * y.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object VectorExprs {
  import org.apache.spark.sql.GraftBridge

  /** Codegen'd float dot product. */
  def dotF32(a: Column, b: Column): Column =
    GraftBridge.column(DotProductF32(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd double dot product. */
  def dotF64(a: Column, b: Column): Column =
    GraftBridge.column(DotProductF64(
      GraftBridge.expression(a), GraftBridge.expression(b)))
  /** Codegen'd cosine from three dot products. */
  def cosineF32(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF32(a, b) / (sqrt(dotF32(a, a)) * sqrt(dotF32(b, b)))
  }
}
