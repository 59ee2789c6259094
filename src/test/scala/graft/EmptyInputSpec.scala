package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.XDataset

/** Degenerate shapes: every core operator must return EMPTY (not throw) on
  * an empty dataset — the reference's behavior on zero-length dims. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val empty = XDataset(
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("t", DoubleType),
        StructField("v", DoubleType)))),
    dims = Seq("k", "t"))

  test("selection / masking / reductions on empty input") {
    assert(empty.sel("k", Seq(1L)).df.count() === 0L)
    assert(empty.selSlice("t", 0.0, 10.0).df.count() === 0L)
    assert(empty.whereMask(col("v") > 0).df.count() === 0L)
    assert(empty.dropna().df.count() === 0L)
    assert(empty.fillna(0.0).df.count() === 0L)
    val agg = empty.reduce(Seq("t"), Seq(sum(col("v")).as("s")))
    assert(agg.count() === 0L) // no groups -> no rows
  }

  test("windows / interp / dedup on empty input") {
    val w = graft.window.Windows.rolling(Seq(col("k")), Seq(col("t")), 3)
    assert(empty.df.withColumn("m", avg(col("v")).over(w)).count() === 0L)
    val probes = Seq((1L, 5.0)).toDF("k", "t")
    val interp = graft.numerics.Numerics.interpLinear(
      empty.df, probes, by = Seq("k"), t = "t", v = "v")
    // probes with no observations -> NULL interp, not an error
    assert(interp.count() === 1L)
    assert(interp.filter(col("v_interp").isNotNull).count() === 0L)
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(graft.llm.Dedup.exact(docs, "doc_id", "text").count() === 0L)
  }

  test("single-row input: rolling/pad/rank degenerate gracefully") {
    val one = Seq((1L, 0L, 2.5)).toDF("k", "pos", "v")
    val padded = graft.window.Pad.pad(one, "pos", "v", n = 1,
      before = 1, after = 1, constant = 0.0)
    assert(padded.count() === 3L)
    val ranked = graft.agg.Rank.avgRank(one.select("v"), "v", "r")
    assert(ranked.head().getDouble(1) === 1.0)
  }
}
