package graft.tools

import org.apache.spark.scheduler._
import scala.collection.mutable

/** SCRATCH optimization-round profiler (delete at round close): run named
  * registry queries N times and print per-JOB wall timings with stage
  * task-time breakdown, so the expensive pass inside a multi-job verb is
  * attributable.
  *
  *   runMain graft.tools.Profile q356_kcore q386_label_propagation
  *
  * env: SPARK_GRAFT_SF_DIR, SPARK_GRAFT_CPUS, SPARK_GRAFT_PROFILE_REPS. */
object Profile {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors().toString)
    val reps = sys.env.getOrElse("SPARK_GRAFT_PROFILE_REPS", "2").toInt
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
    // scratch A/B lever: SPARK_GRAFT_CONF="k=v;k2=v2" runtime conf overrides
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";").filter(_.nonEmpty)
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2); spark.conf.set(k, v)
      })

    case class JobRow(id: Int, desc: String, wallMs: Long, stages: Int,
                      tasks: Int, taskTimeMs: Long)
    val jobs = mutable.ArrayBuffer[JobRow]()
    val jobStart = mutable.Map[Int, (Long, String)]()
    val jobStages = mutable.Map[Int, Seq[Int]]()
    val stageTasks = mutable.Map[Int, (Int, Long)]()
    val listener = new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val desc = Option(e.properties)
          .flatMap(p => Option(p.getProperty("spark.job.description")))
          .getOrElse("")
        jobStart(e.jobId) = (System.nanoTime(), desc)
        jobStages(e.jobId) = e.stageIds
      }
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = {
        val (n, t) = stageTasks.getOrElse(e.stageId, (0, 0L))
        val rt = Option(e.taskMetrics).map(_.executorRunTime).getOrElse(0L)
        stageTasks(e.stageId) = (n + 1, t + rt)
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        jobStart.remove(e.jobId).foreach { case (t0, desc) =>
          val sids = jobStages.getOrElse(e.jobId, Nil)
          val (nt, tt) = sids.map(s => stageTasks.getOrElse(s, (0, 0L)))
            .foldLeft((0, 0L)) { case ((a, b), (c, d)) => (a + c, b + d) }
          jobs += JobRow(e.jobId, desc, (System.nanoTime() - t0) / 1000000,
            sids.size, nt, tt)
        }
      }
    }
    spark.sparkContext.addSparkListener(listener)

    for (name <- args) {
      (1 to reps).foreach { r =>
        jobs.clear()
        val t0 = System.nanoTime()
        graft.util.QueryCache.scoped {
          graft.SparkEntry.queries(name)(spark, dir).count()
        }
        val wall = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        // give the async listener bus a beat to drain before reading
        Thread.sleep(300)
        println(f"===== $name rep $r: wall $wall%.2f s, ${jobs.size} jobs =====")
        jobs.foreach { j =>
          println(f"  job ${j.id}%4d ${j.wallMs}%6d ms  stages=${j.stages}%2d" +
            f" tasks=${j.tasks}%4d taskTime=${j.taskTimeMs}%7d ms  ${j.desc.take(90)}")
        }
      }
    }
    spark.stop()
  }
}
