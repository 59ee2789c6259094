package graft.tools

import org.apache.spark.sql.functions._

/** Scratch (round 15, deleted at close): count k-core peel rounds and
  * per-round drops on the 10x co-purchase graph for BENCH_SCALE.md. */
object ScratchKcore {
  def main(args: Array[String]): Unit = {
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (dir <- args) {
      // ":wide" suffix: also shift the part space per replica (replica =
      // r from the shifted orderkey), giving a genuinely 10x-node graph
      // of 10 disjoint copies instead of 10x baskets over fixed items
      val wide = dir.endsWith(":wide")
      val d = dir.stripSuffix(":wide")
      val li0 = graft.io.Tables.lineitem(spark, d)
        .filter(col("l_orderkey") % 10 === 0)
      val li = if (!wide) li0 else li0.withColumn("l_partkey",
        col("l_partkey") + expr("(l_orderkey div 10000000) * 10000000"))
      val bi = li
        .select(col("l_orderkey").as("b"), col("l_partkey").as("i"))
        .distinct()
      val edges0 = bi.as("a").join(bi.as("b2"),
          col("a.b") === col("b2.b") && col("a.i") < col("b2.i"))
        .select(col("a.i").as("x"), col("b2.i").as("y"))
      var e = edges0.select(least(col("x"), col("y")).as("u"),
          greatest(col("x"), col("y")).as("v"))
        .filter(col("u") =!= col("v"))
        .distinct().localCheckpoint(true)
      println(s"KC $dir edges0=${e.count()}")
      var round = 0
      var done = false
      while (!done && round < 20) {
        val t0 = System.nanoTime()
        val deg = e.select(col("u").as("n"))
          .unionByName(e.select(col("v").as("n")))
          .groupBy(col("n")).agg(count(lit(1)).as("d"))
        val drop = deg.filter(col("d") < 3).select("n")
          .localCheckpoint(true)
        val nd = drop.count()
        if (nd == 0) done = true
        else {
          e = e.join(drop, col("u") === col("n"), "left_anti")
            .join(drop, col("v") === col("n"), "left_anti")
            .localCheckpoint(true)
        }
        round += 1
        println(f"KC $dir round=$round dropped=$nd " +
          f"wall=${(System.nanoTime() - t0) / 1e9}%.2f s")
      }
      println(s"KC $dir rounds=$round finalEdges=${e.count()}")
    }
    spark.stop()
  }
}
