package graft

import org.apache.spark.sql.functions._
import graft.model.Positions

/** Ordinal attachment: the dense-integer projection fast path and the
  * range-partitioned fallback must agree. */
class PositionsSpec extends SparkSpec {
  import spark.implicits._

  test("dense integer keys: positions are key - min (projection path)") {
    val df = Seq(7L, 5L, 9L, 6L, 8L).toDF("k")
    val pos = Positions.zipWithIndex(df, Seq(col("k")), "pos")
    assert(pos.orderBy("pos").select("k").as[Long].collect().toSeq ===
      Seq(5L, 6L, 7L, 8L, 9L))
    assert(pos.filter(col("k") === 9L).select("pos").as[Long].head() === 4L)
    // projection path: no exchange in the plan
    assert(!pos.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("sparse keys fall back to the range scheme with the same result") {
    val df = Seq(10L, 2L, 50L, 7L).toDF("k")
    val pos = Positions.zipWithIndex(df, Seq(col("k")), "pos")
    assert(pos.orderBy("pos").select("k").as[Long].collect().toSeq ===
      Seq(2L, 7L, 10L, 50L))
  }

  test("duplicate keys fall back (density probe requires distinctness)") {
    val df = Seq(0L, 1L, 1L).toDF("k") // max-min+1 == 2 != count
    val pos = Positions.zipWithIndex(df, Seq(col("k")), "pos")
    assert(pos.select("pos").as[Long].collect().sorted.toSeq ===
      Seq(0L, 1L, 2L))
  }

  test("multi-column order uses the range scheme") {
    val df = Seq((1, "b"), (1, "a"), (0, "z")).toDF("g", "s")
    val pos = Positions.zipWithIndex(df, Seq(col("g"), col("s")), "pos")
    assert(pos.orderBy("pos").select("s").as[String].collect().toSeq ===
      Seq("z", "a", "b"))
  }
}
