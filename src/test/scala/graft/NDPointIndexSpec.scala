package graft

import org.apache.spark.sql.functions._
import graft.align.NDPointIndex

/** Grid-bucketed coordinate KNN vs brute force (ref
  * `xarray/indexes/nd_point_index.py` KD-tree sel method="nearest"). */
class NDPointIndexSpec extends SparkSpec {
  import spark.implicits._

  test("nearest within tolerance, out-of-range probes dropped, ties on id") {
    val corpus = Seq((1L, 0.0, 0.0), (2L, 10.0, 0.0), (3L, 10.0, 2.0),
      (4L, 50.0, 50.0)).toDF("id", "x", "y")
    val probes = Seq((100L, 1.0, 0.0),   // nearest id=1 at dist 1
      (101L, 10.0, 1.0),                 // tie id=2/id=3 at dist 1 -> id=2
      (102L, 30.0, 30.0)                 // nothing within tol=5
    ).toDF("id", "x", "y")
    val out = NDPointIndex.selNearest(corpus, probes, Seq("x", "y"),
        "id", "id", tolerance = 5.0)
      .orderBy("__pid").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(out.toSeq === Seq((100L, 1L, 1.0), (101L, 2L, 1.0)))
  }

  test("grid join result is identical to brute force on random points") {
    val n = 500
    val corpus = spark.range(n).select(col("id"),
      (pmod(col("id") * 2654435761L, lit(1000)) / 10.0).as("x"),
      (pmod(col("id") * 40503L, lit(1000)) / 10.0).as("y"))
    val probes = spark.range(100).select((col("id") + 1000L).as("id"),
      (pmod(col("id") * 97687L, lit(1000)) / 10.0).as("x"),
      (pmod(col("id") * 51749L, lit(1000)) / 10.0).as("y"))
    val grid = NDPointIndex.selNearest(corpus, probes, Seq("x", "y"),
      "id", "id", tolerance = 7.5)
    // brute force: cross join + window argmin
    val c = corpus.select(col("id").as("cid"), col("x").as("cx"), col("y").as("cy"))
    val p = probes.select(col("id").as("pid"), col("x").as("px"), col("y").as("py"))
    val d2 = (col("px") - col("cx")) * (col("px") - col("cx")) +
      (col("py") - col("cy")) * (col("py") - col("cy"))
    val brute = p.crossJoin(c).withColumn("d2", d2)
      .filter(col("d2") <= 7.5 * 7.5)
      .groupBy("pid")
      .agg(min_by(struct(col("cid"), col("d2")),
        struct(col("d2"), col("cid"))).as("b"))
      .select(col("pid").as("__pid"), col("b.cid").as("__cid"),
        col("b.d2").as("__d2"))
    assert(grid.exceptAll(brute).count() === 0L)
    assert(brute.exceptAll(grid).count() === 0L)
    assert(grid.count() > 0L)
  }

  test("plan is an equi-join on cell keys, not a cartesian product") {
    val corpus = Seq((1L, 0.0, 0.0)).toDF("id", "x", "y")
    val probes = Seq((2L, 1.0, 1.0)).toDF("id", "x", "y")
    val plan = NDPointIndex.selNearest(corpus, probes, Seq("x", "y"),
      "id", "id", 5.0).queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      s"grid KNN must not degenerate to a cross join:\n$plan")
  }
}
