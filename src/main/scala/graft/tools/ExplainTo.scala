package graft.tools

import org.apache.spark.sql.execution.FormattedMode

/** Optimization-round evidence dumps: write the `.explain("formatted")`
  * output of named registry queries to files.
  *
  *   runMain graft.tools.ExplainTo plans/r17 before q154_lm_perplexity ...
  *
  * writes `plans/r17/q154_lm_perplexity_before.txt` etc. The query is
  * EXECUTED first (count) so the AQE-final plan is the one dumped, then
  * the pre-execution formatted plan is appended for the scan evidence
  * (PushedFilters / ReadSchema). Session shape mirrors Bench
  * (SPARK_GRAFT_SF_DIR / SPARK_GRAFT_CPUS). */
object ExplainTo {
  def main(args: Array[String]): Unit = {
    val outDir = args(0)
    val tag = args(1)
    val names = args.drop(2)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val spark = org.apache.spark.sql.SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    graft.util.Parallelize.tuneShuffle(spark, dir)
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(outDir))
    for (name <- names) {
      graft.util.QueryCache.scoped {
        val d = graft.SparkEntry.queries(name)(spark, dir)
        val formatted = d.queryExecution.explainString(FormattedMode)
        d.count() // materialize so AQE finalizes the executed plan
        val fin = d.queryExecution.executedPlan.toString
        val txt = s"===== $name ($tag) — explain(formatted) =====\n" +
          formatted +
          s"\n===== $name ($tag) — AQE-final executed plan =====\n" + fin
        java.nio.file.Files.writeString(
          java.nio.file.Paths.get(s"$outDir/${name}_$tag.txt"), txt)
        println(s"wrote $outDir/${name}_$tag.txt")
      }
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
