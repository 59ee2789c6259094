package graft

import org.apache.spark.sql.functions._
import graft.numerics.{Bootstrap, Survival}

class SurvivalSpec extends SparkSpec {
  import spark.implicits._

  test("kaplanMeier matches the brute-force product-limit estimator " +
    "with censoring") {
    // classic worked example: durations with events (1) and censorings (0)
    val subj = Seq(
      (1L, 1), (2L, 1), (2L, 0), (3L, 1), (4L, 0), (4L, 1), (5L, 0),
      (6L, 1), (6L, 1), (7L, 0), (8L, 1), (9L, 0), (10L, 0))
    val df = subj.toDF("dur", "ev")
    val got = Survival.kaplanMeier(df, "dur", "ev")
      .orderBy("duration").collect()

    // brute force in exact BigInt fixed-point (independent reimpl)
    val grid = BigInt(1000000000000L)
    val byT = subj.groupBy(_._1).map { case (t, xs) =>
      (t, xs.count(_._2 == 1).toLong, xs.count(_._2 == 0).toLong)
    }.toSeq.sortBy(_._1)
    var atRisk = subj.size.toLong
    var s = grid
    var h = BigInt(0)
    val expect = byT.map { case (t, d, c) =>
      val n = atRisk
      s = s * BigInt(n - d) / BigInt(n)
      h = h + BigInt(d) * grid / BigInt(n)
      atRisk -= d + c
      (t, n, d, c, s.toLong, h.toLong)
    }
    assert(got.length == expect.length)
    got.zip(expect).foreach { case (r, (t, n, d, c, se, he)) =>
      assert(r.getLong(0) == t && r.getLong(1) == n &&
        r.getLong(2) == d && r.getLong(3) == c, s"counts at t=$t")
      assert(r.getLong(4) == se, s"survival at t=$t")
      assert(r.getLong(5) == he, s"hazard at t=$t")
    }
    // survival is non-increasing and hazard non-decreasing
    val surv = got.map(_.getLong(4))
    assert(surv.zip(surv.tail).forall { case (a, b) => b <= a })
    val haz = got.map(_.getLong(5))
    assert(haz.zip(haz.tail).forall { case (a, b) => b >= a })
    // all-event data at one time: survival drops to 0
    val allEv = Survival.kaplanMeier(
      Seq((3L, 1), (3L, 1)).toDF("dur", "ev"), "dur", "ev").collect()
    assert(allEv.length == 1 && allEv.head.getLong(4) == 0L)
  }

  test("poisson bootstrap weights are deterministic with the Poisson(1) " +
    "pmf shape, and the CI brackets the mean") {
    val df = (1 to 2000).map(i => (i.toLong, 100L + (i % 7))).toDF("id", "v")
    val w1 = df.withColumn("u",
        Bootstrap.uniform1e12(concat(col("id"), lit("#0"))))
      .withColumn("w", Bootstrap.poissonWeight(col("u")))
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // pmf at k=0 and k=1 are both 1/e ~ 0.368: expect ~736 each ±80
    assert(math.abs(w1.getOrElse(0L, 0L) - 736) < 80, w1.toString)
    assert(math.abs(w1.getOrElse(1L, 0L) - 736) < 80, w1.toString)
    // k=2 ~ 0.184 => ~368
    assert(math.abs(w1.getOrElse(2L, 0L) - 368) < 60, w1.toString)
    // determinism: a second evaluation is identical
    val w2 = df.withColumn("u",
        Bootstrap.uniform1e12(concat(col("id"), lit("#0"))))
      .withColumn("w", Bootstrap.poissonWeight(col("u")))
      .groupBy("w").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(w1 == w2)

    val ci = Bootstrap.meanCI(df, col("id"), col("v"), reps = 48,
      alphaPm = 25).head()
    val mean = ci.getLong(1); val lo = ci.getLong(2); val hi = ci.getLong(3)
    assert(ci.getLong(0) == 48L)
    assert(lo <= mean && mean <= hi, s"$lo <= $mean <= $hi")
    assert(hi - lo < 10, s"CI implausibly wide for near-constant data: " +
      s"[$lo, $hi]")
  }

  test("meanCIBCa: symmetric data gives ~zero corrections, skew " +
    "signs the acceleration") {
    import spark.implicits._
    // symmetric values: a ~ 0 (m3 = 0 exactly), z0 small, and the BCa
    // interval stays inside the replicate range around the mean
    val sym = (1L to 400L).map(i => (i, 1000L + (if (i % 2 == 0) i / 2
      else -(i / 2 + 1)))).toDF("id", "v")
    val r = Bootstrap.meanCIBCa(sym, col("id"), col("v")).head()
    assert(r.getLong(0) === 48L)
    assert(math.abs(r.getAs[Double]("a8")) < 1e-6) // m3 exactly 0
    assert(math.abs(r.getAs[Double]("z0_8")) < 0.6)
    val (m, lo, hi) = (r.getAs[Long]("mean_fp"),
      r.getAs[Long]("lo_fp"), r.getAs[Long]("hi_fp"))
    assert(lo <= m && m <= hi, s"$lo <= $m <= $hi")
    // right-skewed values: positive third moment -> a8 > 0
    val skew = (1L to 400L).map(i =>
      (i, if (i % 20 == 0) 10000L else 10L)).toDF("id", "v")
    val rs = Bootstrap.meanCIBCa(skew, col("id"), col("v")).head()
    assert(rs.getAs[Double]("a8") > 0.0)
    // empty input -> empty frame (the meanCI contract)
    assert(Bootstrap.meanCIBCa(sym.filter(col("id") < 0), col("id"),
      col("v")).count() === 0L)
  }

  test("shared normal polynomials hit textbook quantiles within A&S error") {
    import spark.implicits._
    val one = Seq(1).toDF("x")
    def eval(sql: String): Double =
      one.selectExpr(s"$sql AS v").head().getDouble(0)
    // A&S 26.2.23 |eps| < 4.5e-4; 26.2.17 |eps| < 7.5e-8
    assert(math.abs(eval(Bootstrap.invPhiSql("0.975"))
      - 1.959963984540054) < 4.5e-4)
    assert(math.abs(eval(Bootstrap.invPhiSql("0.025"))
      + 1.959963984540054) < 4.5e-4)
    assert(math.abs(eval(Bootstrap.invPhiSql("0.5"))) < 4.5e-4)
    assert(math.abs(eval(Bootstrap.phiSql("1.959963984540054"))
      - 0.975) < 1e-6)
    assert(math.abs(eval(Bootstrap.phiSql("-1.959963984540054"))
      - 0.025) < 1e-6)
    assert(math.abs(eval(Bootstrap.phiSql("0.0")) - 0.5) < 1e-7)
    // round-trip: phi(invPhi(p)) ~ p across the unit interval
    for (p <- Seq(0.01, 0.1, 0.3, 0.7, 0.9, 0.99))
      assert(math.abs(eval(Bootstrap.phiSql(
        s"(${Bootstrap.invPhiSql(p.toString)})")) - p) < 1.5e-3, s"p=$p")
  }

  test("diffMeansCI brackets a planted between-arm lift") {
    // arm A mean 200, arm B mean 100 (+/- small id-derived noise)
    val df = (1 to 3000).map { i =>
      val a = i % 2 == 0
      (i.toLong, a, (if (a) 200L else 100L) + (i % 5) - 2)
    }.toDF("id", "a", "v")
    val r = Bootstrap.diffMeansCI(df, col("id"), col("a"), col("v"),
      reps = 48, alphaPm = 25).head()
    val diff = r.getLong(1); val lo = r.getLong(2); val hi = r.getLong(3)
    assert(r.getLong(0) == 48L)
    assert(lo <= diff && diff <= hi, s"$lo <= $diff <= $hi")
    assert(diff >= 98L && diff <= 102L, s"full-data diff $diff")
    assert(lo > 90L && hi < 110L, s"CI [$lo, $hi] too wide")
    // single-arm input yields no CI row (diff undefined), never a throw
    assert(Bootstrap.diffMeansCI(df.filter(col("a")), col("id"),
      col("a"), col("v")).count() == 0L)
  }

  test("didCI brackets a planted interaction effect") {
    // base 100; post +10 everywhere; treated post gets +50 extra:
    // true did = 50 (the parallel-trends construction)
    val df = (1 to 4000).map { i =>
      val t = i % 2 == 0
      val p = (i / 2) % 2 == 0
      val v = 100L + (if (p) 10L else 0L) +
        (if (t && p) 50L else 0L) + (i % 5) - 2
      (i.toLong, t, p, v)
    }.toDF("id", "t", "p", "v")
    val r = Bootstrap.didCI(df, col("id"), col("t"), col("p"), col("v"),
      reps = 48, alphaPm = 25).head()
    val did = r.getLong(1); val lo = r.getLong(2); val hi = r.getLong(3)
    assert(r.getLong(0) == 48L)
    assert(lo <= did && did <= hi, s"$lo <= $did <= $hi")
    assert(did >= 48L && did <= 52L, s"full-data did $did")
    // a missing cell (no control-post rows) empties the result
    assert(Bootstrap.didCI(df.filter(col("t") || !col("p")), col("id"),
      col("t"), col("p"), col("v")).count() == 0L)
  }

  test("wilsonInterval matches the closed form and brackets p_hat") {
    val rows = Seq.fill(40)(("A", true)) ++ Seq.fill(60)(("A", false)) ++
      Seq.fill(1)(("B", true)) ++ Seq.fill(9)(("B", false))
    val got = graft.numerics.Stats.wilsonInterval(
        rows.toDF("g", "s"), "g", col("s"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3),
          r.getDouble(4), r.getDouble(5))).toMap
    def wilson(n: Double, k: Double): (Double, Double) = {
      val z = 1.959963984540054
      val p = k / n
      val center = p + z * z / (2 * n)
      val spread = z * math.sqrt(p * (1 - p) / n + z * z / (4 * n * n))
      val den = 1 + z * z / n
      ((center - spread) / den, (center + spread) / den)
    }
    val (loA, hiA) = wilson(100, 40)
    val (gnA, gkA, gpA, gloA, ghiA) = got("A")
    assert(gnA == 100L && gkA == 40L && gpA == 400000L)
    assert(math.abs(gloA - loA) < 1e-7 && math.abs(ghiA - hiA) < 1e-7)
    // textbook check: n=100, k=40 -> [0.3094, 0.4980] approximately
    assert(math.abs(gloA - 0.30933) < 5e-4 && math.abs(ghiA - 0.49793) < 5e-4)
    val (loB, hiB) = wilson(10, 1)
    val (_, _, _, gloB, ghiB) = got("B")
    assert(math.abs(gloB - loB) < 1e-7 && math.abs(ghiB - hiB) < 1e-7)
    // Wilson never leaves [0, 1] even at extreme rates
    assert(gloB >= 0.0 && ghiB <= 1.0)
  }
}
