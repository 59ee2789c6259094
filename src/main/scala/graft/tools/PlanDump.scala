package graft.tools

/** PLANS.md maintenance: print the executed physical plan of named
  * registry queries at the bench scale factor.
  *
  *   runMain graft.tools.PlanDump q146_seq_packing q382_...
  *
  * (env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS — the Bench session
  * shape, so the dumped plan is the one the benchmark runs.) */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    for (name <- args) {
      val df = graft.util.QueryCache.scoped {
        val d = graft.SparkEntry.queries(name)(spark, dir)
        d.count() // materialize so AQE finalizes what it can
        println(s"===== $name =====")
        println(d.queryExecution.executedPlan.toString)
        d
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
