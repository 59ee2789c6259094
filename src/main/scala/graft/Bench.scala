package graft

import org.apache.spark.sql.SparkSession

/** Driver-run benchmark: every registered query on SPARK_GRAFT_SF_DIR,
  * one JSON line on stdout (BASELINE.md contract).
  *
  * A warmup query runs first so JIT/classloading cost doesn't land on an
  * arbitrary query; queries then run in sorted name order for run-to-run
  * comparability.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // warmup: JIT, codegen, parquet footer caches — one cheap query per
    // table family so no measured query pays the cold first scan
    for (q <- Seq("q01_agg_partial",   // lineitem
                  "q57_fingerprint",   // documents
                  "q54_cosine_topk",   // embeddings
                  "q28_shift_diff",    // events
                  "q38_scalar_ops"))   // customer
      try SparkEntry.queries(q)(spark, sfDir).count()
      catch { case _: Throwable => () }

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val n = try fn(spark, sfDir).count() catch { case _: Throwable => -1L }
      val secs = (System.nanoTime() - t0) / 1e9
      if (n < 0) System.err.println(s"[bench] $name FAILED")
      name -> secs
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + f"$v%.3f" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
