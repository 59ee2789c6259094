package graft

import org.apache.spark.sql.functions._
import graft.numerics.Numerics

/** Arbitrary-degree polyfit (polyfitMoments) and the deg-3 covariance path
  * (fit3cov): exact recovery on noiseless polynomials, agreement between
  * the Gauss-Jordan and Cramer solvers, and the reference's rank /
  * point-count guards ("number of data points must exceed order"). */
class PolyfitSpec extends SparkSpec {
  import spark.implicits._

  private def mkPoly(coefs: Seq[Double], noise: Double => Double = _ => 0.0) = {
    val xs = (0 until 60).map(i => i / 59.0)
    xs.map { x =>
      val y = coefs.zipWithIndex.map { case (c, k) => c * math.pow(x, k) }.sum
      (1L, x, y + noise(x))
    }.toDF("g", "x", "y")
  }

  test("polyfitMoments recovers a noiseless quadratic exactly; cov diag ~ 0") {
    val df = mkPoly(Seq(1.0, 2.0, 3.0))
    val r = Numerics.polyfitMoments(df, Seq("g"), col("x"), col("y"), deg = 2)
      .collect().head
    val coefs = r.getSeq[Double](1)
    val cov = r.getSeq[Double](2)
    Seq(1.0, 2.0, 3.0).zip(coefs).foreach { case (w, c) =>
      assert(math.abs(c - w) < 1e-7, s"coef $c want $w")
    }
    // noiseless => rss is pure round-off; the cov diag is round-off scaled
    // by inv(X'X), so ~0 only to ~1e-8
    cov.foreach(v => assert(math.abs(v) < 1e-8, s"cov $v should be ~0"))
  }

  test("polyfitMoments deg=3 agrees with the fit3cov Cramer path on noisy data") {
    val df = mkPoly(Seq(0.5, -1.0, 2.0, 4.0), x => 0.05 * math.sin(37 * x))
    val gj = Numerics.polyfitMoments(df, Seq("g"), col("x"), col("y"), deg = 3)
      .collect().head
    // the split moments+solve pipeline — the shape q118 ships (a one-shot
    // moments-and-solve aggregate expression overflows janino's 64 KB
    // method limit and silently falls back to interpreted execution)
    val ms = Numerics.fit3covMoments(col("x"), col("y"))
    val cr = df.groupBy("g").agg(ms.head, ms.tail: _*)
      .withColumn("f", Numerics.fit3covSolve)
      .select((0 to 3).map(k => col(s"f.c$k")) ++ (0 to 3).map(k => col(s"f.v$k")): _*)
      .collect().head
    val gjC = gj.getSeq[Double](1); val gjV = gj.getSeq[Double](2)
    for (k <- 0 to 3) {
      assert(math.abs(gjC(k) - cr.getDouble(k)) < 1e-7 * math.max(1, math.abs(gjC(k))),
        s"c$k GJ=${gjC(k)} Cramer=${cr.getDouble(k)}")
      assert(math.abs(gjV(k) - cr.getDouble(4 + k)) < 1e-7 * math.max(1, math.abs(gjV(k))),
        s"v$k GJ=${gjV(k)} Cramer=${cr.getDouble(4 + k)}")
    }
  }

  test("rank-deficient (constant x) and too-few-points groups return NULL") {
    val constX = Seq.tabulate(10)(i => (1L, 2.5, i.toDouble)).toDF("g", "x", "y")
    val r1 = Numerics.polyfitMoments(constX, Seq("g"), col("x"), col("y"), deg = 2)
      .collect().head
    assert(r1.isNullAt(1) && r1.isNullAt(2), "constant x must yield NULL fit")

    val few = Seq((1L, 0.0, 1.0), (1L, 1.0, 2.0), (1L, 2.0, 3.0)).toDF("g", "x", "y")
    val r2 = Numerics.polyfitMoments(few, Seq("g"), col("x"), col("y"), deg = 3)
      .collect().head
    assert(r2.isNullAt(1) && r2.isNullAt(2), "n <= deg+1 must yield NULL fit")
  }

  test("deg=1 matches the closed-form fitSlope/fitIntercept pair") {
    val df = mkPoly(Seq(3.0, -2.0), x => 0.01 * math.cos(11 * x))
    val gj = Numerics.polyfitMoments(df, Seq("g"), col("x"), col("y"), deg = 1)
      .collect().head.getSeq[Double](1)
    val cf = df.groupBy("g").agg(
      Numerics.fitIntercept(col("x"), col("y")).as("i"),
      Numerics.fitSlope(col("x"), col("y")).as("s")).collect().head
    // fitSlope/fitIntercept accumulate moments at decimal scale 6,
    // polyfitMoments at scale 9 — agreement is to the coarser scale
    assert(math.abs(gj(0) - cf.getDouble(1)) < 1e-5, s"intercept ${gj(0)} vs ${cf.getDouble(1)}")
    assert(math.abs(gj(1) - cf.getDouble(2)) < 1e-5, s"slope ${gj(1)} vs ${cf.getDouble(2)}")
  }
}
