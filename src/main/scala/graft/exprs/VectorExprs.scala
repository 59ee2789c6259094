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

/** Unit-normalize a numeric vector (float or double elements) into
  * array<double> — the same index-ordered sequential fold as the
  * higher-order form `transform(v, x/sqrt(aggregate(transform(v, x*x),
  * 0d, +)))` (bit-identical, SQL `list_reduce`-replayable), but as one
  * generated Java loop instead of ~3 interpreted lambda passes per row.
  * Null ELEMENTS are unsupported (embedding vectors are dense); a null
  * array is null. Zero vectors divide by 0.0 → NaN, as in the HOF form. */
case class L2NormalizeVec(child: Expression)
  extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  private def elemIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val out = new Array[Double](n)
    var acc = 0.0; var i = 0
    if (elemIsFloat) while (i < n) {
      val v = x.getFloat(i).toDouble; out(i) = v; acc += v * v; i += 1
    } else while (i < n) {
      val v = x.getDouble(i); out(i) = v; acc += v * v; i += 1
    }
    val nrm = math.sqrt(acc)
    i = 0
    while (i < n) { out(i) = out(i) / nrm; i += 1 }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val out = ctx.freshName("out")
      val nrm = ctx.freshName("nrm")
      val get = if (elemIsFloat) s"(double) $a.getFloat" else s"$a.getDouble"
      s"""
         |int $n = $a.numElements();
         |double[] $out = new double[$n];
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double v = $get($i); $out[$i] = v; $acc += v * v;
         |}
         |double $nrm = java.lang.Math.sqrt($acc);
         |for (int $i = 0; $i < $n; $i++) { $out[$i] = $out[$i] / $nrm; }
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($out);
       """.stripMargin
    })

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

/** Sum of squared differences of two vectors (float or double elements
  * each, independently) — the k-means assign kernel `aggregate(
  * zip_with(v, c, (x,y) => (x-y)^2), 0d, +)` as one generated loop.
  * Same index-ordered accumulation, bit-identical to the HOF form. */
case class SumSqDiff(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      val d = xv - yv; acc += d * d; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc"); val d = ctx.freshName("d")
      val ga = if (isFloat(left)) s"(double) $a.getFloat" else s"$a.getDouble"
      val gb = if (isFloat(right)) s"(double) $b.getFloat" else s"$b.getDouble"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = $ga($i) - $gb($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Dot product with independent float/double element dispatch per side —
  * for mixed pairs like a float embedding against a literal double ±1
  * hyperplane. Same index-ordered sequential accumulation as
  * [[DotProductF32]]/[[DotProductF64]] (list_reduce-replayable). */
case class DotProductVec(left: Expression, right: Expression)
  extends BinaryExpression {

  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]; val y = b.asInstanceOf[ArrayData]
    val (lf, rf) = (isFloat(left), isFloat(right))
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0; var i = 0
    while (i < n) {
      val xv = if (lf) x.getFloat(i).toDouble else x.getDouble(i)
      val yv = if (rf) y.getFloat(i).toDouble else y.getDouble(i)
      acc += xv * yv; i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i"); val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      val ga = if (isFloat(left)) s"(double) $a.getFloat" else s"$a.getDouble"
      val gb = if (isFloat(right)) s"(double) $b.getFloat" else s"$b.getDouble"
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $ga($i) * $gb($i);
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
  /** Codegen'd dot product, float/double elements dispatched per side. */
  def dot(a: Column, b: Column): Column =
    GraftBridge.column(DotProductVec(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd unit-normalization (float or double input elements). */
  def l2normalize(v: Column): Column =
    GraftBridge.column(L2NormalizeVec(GraftBridge.expression(v)))

  /** Codegen'd squared-L2 distance (float or double elements per side). */
  def sumSqDiff(a: Column, b: Column): Column =
    GraftBridge.column(SumSqDiff(
      GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Codegen'd cosine from three dot products. */
  def cosineF32(a: Column, b: Column): Column = {
    import org.apache.spark.sql.functions.sqrt
    dotF32(a, b) / (sqrt(dotF32(a, a)) * sqrt(dotF32(b, b)))
  }
}
