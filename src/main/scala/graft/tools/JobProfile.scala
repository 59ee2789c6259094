package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart, SparkListenerStageCompleted}
import java.util.concurrent.atomic.AtomicInteger

/** Scratch adjudication profiler (round 16; deleted at close): counts
  * Spark jobs/stages per named registry query under the Bench session
  * shape and measures the box's current per-job scheduling floor, so
  * sub-second baseline drift can be decomposed as jobs x floor (the
  * q146 standard). */
object JobProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new AtomicInteger(0)
    val stages = new AtomicInteger(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit =
        stages.incrementAndGet()
    })
    // per-job floor: an empty-ish single-stage job, min of 5
    spark.range(1000000).count() // warm
    val floor = (1 to 5).map { _ =>
      val t0 = System.nanoTime()
      spark.range(1000000).count()
      (System.nanoTime() - t0) / 1e9
    }.min
    println(f"[jobprofile] per-job floor (range(1e6).count min-of-5): $floor%.3f s")
    args.foreach { name =>
      val fn = graft.SparkEntry.queries(name)
      // pass 1 absorbs cold costs; report pass-3 (steady) counts/time
      (1 to 3).foreach { p =>
        Thread.sleep(200) // let listener events drain
        val j0 = jobs.get(); val s0 = stages.get()
        val t0 = System.nanoTime()
        graft.util.QueryCache.scoped { fn(spark, sfDir).count() }
        val secs = (System.nanoTime() - t0) / 1e9
        spark.catalog.clearCache()
        Thread.sleep(200)
        println(f"[jobprofile] $name pass$p: ${jobs.get() - j0} jobs, " +
          f"${stages.get() - s0} stages, $secs%.3f s")
      }
    }
    spark.stop()
  }
}
