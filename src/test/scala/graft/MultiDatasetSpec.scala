package graft

import org.apache.spark.sql.functions._
import graft.model.MultiDataset

/** Multi-signature Dataset catalog (SURVEY §1.5): F1-style fixture with
  * var1/var2 over (dim1,dim2) and var3 over (dim3,dim1). */
class MultiDatasetSpec extends SparkSpec {
  import spark.implicits._

  private def fixture: MultiDataset = {
    val g12 = (for { d1 <- 0L until 4L; d2 <- 0L until 3L }
      yield (d1, d2, (d1 * 3 + d2).toDouble, 1.0)).toDF("dim1", "dim2", "var1", "var2")
    val g31 = (for { d3 <- 0L until 2L; d1 <- 0L until 4L }
      yield (d3, d1, (10 * d3 + d1).toDouble)).toDF("dim3", "dim1", "var3")
    MultiDataset(Seq("dim1", "dim2") -> g12, Seq("dim3", "dim1") -> g31)
  }

  test("dims namespace is shared across signature groups") {
    assert(fixture.dims === Seq("dim1", "dim2", "dim3"))
  }

  test("sel along a shared dim filters every group carrying it") {
    val s = fixture.sel("dim1", Seq(1L, 2L))
    assert(s.variable("var1").df.count() === 6)   // 2 dim1 x 3 dim2
    assert(s.variable("var3").df.count() === 4)   // 2 dim3 x 2 dim1
    val s2 = fixture.sel("dim2", Seq(0L))
    assert(s2.variable("var3").df.count() === 8)  // untouched: no dim2
  }

  test("cross-group binary op joins on shared dims and broadcasts the rest") {
    val out = fixture.binaryOp("var1", "var3", "v")(_ + _)
    // dims union (dim1, dim2, dim3): 4 x 3 x 2 = 24 rows
    assert(out.count() === 24)
    assert(out.columns.toSet === Set("dim1", "dim2", "dim3", "v"))
    val m = out.filter(col("dim1") === 1 && col("dim2") === 2 && col("dim3") === 1)
      .select("v").as[Double].head()
    assert(m === (1 * 3 + 2) + (10 * 1 + 1))      // var1(1,2) + var3(1,1)
  }

  test("merge unions variable sets; same-signature tables outer-join") {
    val extra = MultiDataset(Seq("dim1", "dim2") ->
      Seq((0L, 0L, 7.0)).toDF("dim1", "dim2", "var4"))
    val merged = fixture.merge(extra)
    assert(merged.variable("var4").df.count() === 12)  // outer join keeps grid
    assert(merged.dataVars.values.flatten.toSet ===
      Set("var1", "var2", "var3", "var4"))
  }

  test("reduce removes a dim everywhere; colliding signatures merge") {
    val red = fixture.reduce("dim2", sum(_))
    // var1/var2 lose dim2 -> signature (dim1); var3 keeps (dim3, dim1)
    assert(red.variable("var1").meta.dims === Seq("dim1"))
    assert(red.variable("var3").meta.dims === Seq("dim3", "dim1"))
    // var1 over dim1=1: values 3,4,5 -> 12
    val v = red.variable("var1").df.filter(col("dim1") === 1)
      .select("var1").as[Double].head()
    assert(v === 12.0)
    // reducing dim1 out of BOTH groups: (dim2) and (dim3) signatures
    val red2 = fixture.reduce("dim1", sum(_))
    assert(red2.variable("var1").meta.dims === Seq("dim2"))
    assert(red2.variable("var3").meta.dims === Seq("dim3"))
    // reduce to scalar: both vars land on the empty signature, cross-joined
    val scalar = fixture.reduce("dim2", sum(_)).reduce("dim1", sum(_))
      .reduce("dim3", sum(_))
    val row = scalar.variable("var1").df
    assert(row.count() === 1)
  }

  test("groupByCoord joins the coord table and aggregates its dims away") {
    // label coord on dim1: 0,1 -> 'a'; 2,3 -> 'b'
    val label = Seq((0L, "a"), (1L, "a"), (2L, "b"), (3L, "b"))
      .toDF("dim1", "label")
    val withCoord = fixture.merge(MultiDataset(Seq("dim1") -> label))
    val g = withCoord.groupByCoord("label", sum(_))
    // var1 grouped by (label, dim2): 2 labels x 3 dim2
    val v1 = g.variable("var1")
    assert(v1.meta.dims === Seq("label", "dim2"))
    assert(v1.df.count() === 6)
    // label 'a', dim2=0: var1(0,0) + var1(1,0) = 0 + 3
    val v = v1.df.filter(col("label") === "a" && col("dim2") === 0)
      .select("var1").as[Double].head()
    assert(v === 3.0)
    // var3 grouped by (label, dim3): 2 x 2
    assert(g.variable("var3").df.count() === 4)
  }
}
