package graft

import org.apache.spark.sql.functions._
import graft.window.Seasonal

/** Additive decomposition laws: a planted linear trend + zero-sum weekly
  * pattern is recovered exactly (integer grid — no tolerance). */
class SeasonalSpec extends SparkSpec {
  import spark.implicits._

  test("recovers a planted linear trend + zero-sum seasonal, residual 0") {
    val s7 = Array(700L, -350L, 350L, 0L, -700L, 1400L, -1400L) // sums to 0
    val rows = (0 until 70).map(t => (t.toLong, t.toLong % 7,
      10000L + 1000L * t + s7((t % 7).toInt)))
    val df = rows.toDF("t", "phase", "v")
    val out = Seasonal.decomposeAdditive(df, "t", "v", "phase", 7)
      .orderBy("t").collect()
    assert(out.length == 64) // 70 minus the 3+3 short-window edges
    out.foreach { r =>
      val t = r.getAs[Long]("t")
      // centered 7-sum of the linear part is 7*(10000+1000t); the
      // seasonal part sums to zero across any aligned week
      assert(r.getAs[Long]("trend_xp") == 7L * (10000L + 1000L * t))
      assert(r.getAs[Long]("seas_xp") == 7L * s7((t % 7).toInt))
      assert(r.getAs[Long]("resid_xp") == 0L)
    }
  }

  test("identity holds by construction: P*v = trend + seasonal + residual") {
    val rng = new scala.util.Random(7)
    val rows = (0 until 50).map(t =>
      (t.toLong, t.toLong % 7, 5000L + rng.nextInt(2000).toLong))
    val out = Seasonal.decomposeAdditive(
      rows.toDF("t", "phase", "v"), "t", "v", "phase", 7).collect()
    out.foreach { r =>
      assert(7L * r.getAs[Long]("v") == r.getAs[Long]("trend_xp") +
        r.getAs[Long]("seas_xp") + r.getAs[Long]("resid_xp"))
    }
  }

  test("even or degenerate periods are rejected") {
    val df = Seq((1L, 0L, 1L)).toDF("t", "phase", "v")
    intercept[IllegalArgumentException] {
      Seasonal.decomposeAdditive(df, "t", "v", "phase", 6)
    }
  }
}
