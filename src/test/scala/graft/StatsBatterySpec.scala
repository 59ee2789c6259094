package graft

import org.apache.spark.sql.functions._
import graft.numerics.{Conformal, Stats, Survival}

/** Hand-computed pins for the round-14 stats verbs (power/MDE,
  * James–Stein, log-rank, conformal) — the oracle gates check
  * cross-engine agreement; these pin the MATH against closed forms. */
class StatsBatterySpec extends SparkSpec {
  import spark.implicits._

  test("powerMde matches the closed form") {
    // one group, n=2000, k=500 -> p=0.25, n_arm=1000
    val df = (1 to 2000).map(i => ("g", i <= 500)).toDF("grp", "s")
    val r = Stats.powerMde(df, "grp", col("s")).collect()(0)
    assert(r.getAs[Long]("p_ppm") === 250000L)
    val zs = 1.959963984540054 + 0.8416212335729143
    val mde = BigDecimal(zs * math.sqrt(2.0 * 0.25 * 0.75 / 1000))
      .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(r.getAs[Double]("mde8") === mde)
    // n per arm for a 1-pt lift: ceil(zs^2 * 2 * 0.1875 / 1e-4)
    assert(r.getAs[Long]("n_req_per_arm") ===
      math.ceil(zs * zs * 2.0 * 0.1875 / 1e-4).toLong)
  }

  test("jamesSteinMeans shrinks toward the mean of group means") {
    // 5 groups of 100 constant values -> within-variance 0 -> vbar 0
    // -> shrink exactly 1.0 is WRONG (no shrink needed when v=0):
    // shrink = max(0, 1 - 0/S) = 1 and js = mean (identity). Then a
    // noisy variant must shrink strictly.
    val flat = (0 until 5).flatMap(g =>
      (1 to 100).map(i => (s"g$g", 100L * (g + 1)))).toDF("g", "v")
    val rf = Stats.jamesSteinMeans(flat, "g", col("v")).collect()
    rf.foreach { r =>
      assert(r.getAs[Double]("shrink8") === 1.0)
      assert(r.getAs[Double]("js_mean2") === r.getAs[Double]("mean2"))
    }
    // add within-group noise: shrink < 1 and js strictly between
    // mean_g and the grand mean of group means
    val noisy = (0 until 5).flatMap(g =>
      (1 to 100).map(i => (s"g$g",
        100L * (g + 1) + (i % 21) * 40 - 400))).toDF("g", "v")
    val rn = Stats.jamesSteinMeans(noisy, "g", col("v")).collect()
    val sh = rn.head.getAs[Double]("shrink8")
    assert(sh > 0.0 && sh < 1.0, s"shrink $sh")
    val mbar = rn.map(_.getAs[Double]("mean2")).sum / 5.0
    rn.foreach { r =>
      val m = r.getAs[Double]("mean2"); val js = r.getAs[Double]("js_mean2")
      assert(math.abs(js - mbar) <= math.abs(m - mbar) + 1e-9,
        s"js $js not contracted toward $mbar from $m")
    }
  }

  test("logRank: identical groups give chi2 ~ 0; disjoint lifetimes " +
    "give a large chi2") {
    // pair construction: rows 2k and 2k+1 share a duration, one per
    // group — the duration MULTISETS are identical across groups
    val same = (1 to 200).map(i =>
      (i % 2 == 0, ((i / 2) % 10) + 1L, 1)).toDF("a", "dur", "ev")
    val rs = Survival.logRank(same, "dur", "ev", col("a")).collect()(0)
    assert(rs.getAs[Double]("chi2") < 0.01, rs.toString)
    // group A dies at 1..5, group B at 11..15: maximal separation
    val apart = ((1 to 100).map(i => (true, (i % 5) + 1L, 1)) ++
      (1 to 100).map(i => (false, (i % 5) + 11L, 1))).toDF("a", "dur", "ev")
    val ra = Survival.logRank(apart, "dur", "ev", col("a")).collect()(0)
    assert(ra.getAs[Double]("chi2") > 50.0, ra.toString)
  }

  test("conformal: q_hat is the exact order statistic; full coverage " +
    "when test residuals are smaller") {
    // calibration residuals 1..19 (n=19): k = ceil(20*0.9) = 18 -> 18
    val df = ((1 to 19).map(i => (true, 100L + i, 100L)) ++
      (1 to 10).map(i => (false, 100L + (i % 5), 100L)))
      .toDF("cal", "y", "p")
    val r = Conformal.splitInterval(df, col("cal"), col("y"), col("p"))
      .collect()(0)
    assert(r.getAs[Long]("n_calib") === 19L)
    assert(r.getAs[Long]("q_hat") === 18L)
    assert(r.getAs[Long]("coverage_ppm") === 1000000L)
  }
}
