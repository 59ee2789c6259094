package graft.tools

import org.apache.spark.sql.functions._

/** Scratch plan-dump for the round-15 q146 investigation (deleted at
  * round close): prints the executed plan of a named query at the bench
  * scale factor so PLANS.md pins can be refreshed. */
object ProfileQ146 {
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
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count() // finalize AQE
      println(s"===== $name =====")
      println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
