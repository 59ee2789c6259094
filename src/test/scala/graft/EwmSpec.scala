package graft

import org.apache.spark.sql.functions._
import graft.exprs.Ewm

/** EWM mean vs pandas `Series.ewm(alpha=0.3, adjust=True).mean()` reference
  * (ref `computation/rolling_exp.py:49`). */
class EwmSpec extends SparkSpec {
  import spark.implicits._

  test("ewm mean matches pandas incl. NULL handling") {
    val df = Seq(
      (1L, 1L, java.lang.Double.valueOf(1.0)),
      (2L, 1L, java.lang.Double.valueOf(2.0)),
      (3L, 1L, null.asInstanceOf[java.lang.Double]),
      (4L, 1L, java.lang.Double.valueOf(4.0)),
      (5L, 1L, java.lang.Double.valueOf(8.0))
    ).toDF("id", "g", "v")
    val out = Ewm.ewmMean(df, Seq("g"), Seq("id"), "v", "id", alpha = 0.3)
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1))
    val want = Seq(1.0, 1.5882352941176472, 1.5882352941176472,
      2.903982542280415, 5.1360430992948185)
    out.zip(want).foreach { case (g, w) =>
      assert(g != null && math.abs(g.asInstanceOf[Double] - w) < 1e-12, s"got $g want $w")
    }
  }

  test("ewm sum and unbiased var match pandas incl. NULL handling") {
    val df = Seq(
      (1L, 1L, java.lang.Double.valueOf(1.0)),
      (2L, 1L, java.lang.Double.valueOf(2.0)),
      (3L, 1L, null.asInstanceOf[java.lang.Double]),
      (4L, 1L, java.lang.Double.valueOf(4.0)),
      (5L, 1L, java.lang.Double.valueOf(8.0))
    ).toDF("id", "g", "v")
    val sums = Ewm.ewmSum(df, Seq("g"), Seq("id"), "v", "id", alpha = 0.3)
      .orderBy("id").collect().map(_.getDouble(1))
    val wantSum = Seq(1.0, 2.7, 1.89, 5.323, 11.7261)
    sums.zip(wantSum).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"sum got $g want $w") }
    val vars = Ewm.ewmVar(df, Seq("g"), Seq("id"), "v", "id", alpha = 0.3)
      .orderBy("id").collect().map(r => if (r.isNullAt(1)) null else r.getDouble(1))
    // pandas Series.ewm(alpha=0.3, adjust=True).var(bias=False)
    val wantVar = Seq(null, 0.5, 0.5, 2.6047479197258934, 10.675396221172656)
    vars.zip(wantVar).foreach {
      case (null, null) => ()
      case (g, w: Double) =>
        assert(g != null && math.abs(g.asInstanceOf[Double] - w) < 1e-12,
          s"var got $g want $w")
      case (g, w) => fail(s"var got $g want $w")
    }
    // constant series: variance 0 (within fp)
    val const = Seq.tabulate(5)(i => ((i + 1).toLong, 1L, 5.0)).toDF("id", "g", "v")
    Ewm.ewmVar(const, Seq("g"), Seq("id"), "v", "id", 0.3)
      .filter(col("id") >= 2).collect().foreach { r =>
        assert(math.abs(r.getDouble(1)) < 1e-12) }
  }

  test("ewm mean adjust=False and ignore_na=True match pandas") {
    val df = Seq(
      (1L, 1L, java.lang.Double.valueOf(1.0)),
      (2L, 1L, java.lang.Double.valueOf(2.0)),
      (3L, 1L, null.asInstanceOf[java.lang.Double]),
      (4L, 1L, java.lang.Double.valueOf(4.0)),
      (5L, 1L, java.lang.Double.valueOf(8.0))
    ).toDF("id", "g", "v")
    // pandas Series.ewm(alpha=0.3, adjust=False).mean()
    val noadj = Ewm.ewmMeanOpts(df, Seq("g"), Seq("id"), "v", "id",
      alpha = 0.3, adjust = false, ignoreNa = false)
      .orderBy("id").collect().map(_.getDouble(1))
    val wantNoadj = Seq(1.0, 1.2999999999999998, 1.2999999999999998,
      2.3253164556962025, 4.027721518987342)
    noadj.zip(wantNoadj).foreach { case (g, w) =>
      assert(g === w, s"adjust=False got $g want $w") }
    // pandas Series.ewm(alpha=0.3, adjust=True, ignore_na=True).mean()
    val ign = Ewm.ewmMeanOpts(df, Seq("g"), Seq("id"), "v", "id",
      alpha = 0.3, adjust = true, ignoreNa = true)
      .orderBy("id").collect().map(_.getDouble(1))
    val wantIgn = Seq(1.0, 1.5882352941176472, 1.5882352941176472,
      2.6894977168949774, 4.786024476904856)
    ign.zip(wantIgn).foreach { case (g, w) =>
      assert(g === w, s"ignore_na=True got $g want $w") }
    // default knobs reproduce the existing ewmMean path
    val defEq = Ewm.ewmMeanOpts(df, Seq("g"), Seq("id"), "v", "id",
      alpha = 0.3, adjust = true, ignoreNa = false)
      .orderBy("id").collect().map(_.getDouble(1))
    val base = Ewm.ewmMean(df, Seq("g"), Seq("id"), "v", "id", 0.3)
      .orderBy("id").collect().map(_.getDouble(1))
    defEq.zip(base).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"opts-default $a vs ewmMean $b") }
  }

  test("groups are independent") {
    val df = Seq((1L, 1L, 10.0), (2L, 2L, 20.0)).toDF("id", "g", "v")
    val out = Ewm.ewmMean(df, Seq("g"), Seq("id"), "v", "id", 0.5)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out.toSeq == Seq(10.0, 20.0))
  }

  test("time-halflife ewm mean matches pandas (fractional gaps + NULL)") {
    // pandas Series.ewm(halflife=Timedelta('1h'), times=...).mean() with
    // times 00:00 / 00:30 / 02:00 / 02:15 — gaps of 0.5h, 1.5h, 0.25h,
    // so the decay exponents are genuinely fractional
    val us = Seq(0L, 1800L * 1000000, 7200L * 1000000, 8100L * 1000000)
    val df = Seq(
      (1L, 1L, us(0), java.lang.Double.valueOf(1.0)),
      (2L, 1L, us(1), java.lang.Double.valueOf(2.0)),
      (3L, 1L, us(2), java.lang.Double.valueOf(4.0)),
      (4L, 1L, us(3), java.lang.Double.valueOf(8.0))
    ).toDF("id", "g", "t", "v")
    val out = Ewm.ewmMeanTimes(df, Seq("g"), Seq("id"), "t", "v", "id",
      halflife = 3.6e9).orderBy("id").collect().map(_.getDouble(1))
    val want = Seq(1.0, 1.585786437626905, 3.091326307103841,
      5.181526905802528)
    out.zip(want).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"times-ewm got $g want $w") }
    // NULL decays the state without contributing (ignore_na=False)
    val dfn = Seq(
      (1L, 1L, us(0), java.lang.Double.valueOf(1.0)),
      (2L, 1L, us(1), null.asInstanceOf[java.lang.Double]),
      (3L, 1L, us(2), java.lang.Double.valueOf(4.0)),
      (4L, 1L, us(3), java.lang.Double.valueOf(8.0))
    ).toDF("id", "g", "t", "v")
    val outN = Ewm.ewmMeanTimes(dfn, Seq("g"), Seq("id"), "t", "v", "id",
      halflife = 3.6e9).orderBy("id").collect().map(_.getDouble(1))
    val wantN = Seq(1.0, 1.0, 3.4, 5.64267660395309)
    outN.zip(wantN).foreach { case (g, w) =>
      assert(math.abs(g - w) < 1e-12, s"times-ewm null got $g want $w") }
    // per-group time origins are independent
    val dfg = Seq((1L, 1L, 0L, 3.0), (2L, 2L, 99L * 1000000, 7.0))
      .toDF("id", "g", "t", "v")
    val outG = Ewm.ewmMeanTimes(dfg, Seq("g"), Seq("id"), "t", "v", "id",
      halflife = 3.6e9).orderBy("id").collect().map(_.getDouble(1))
    assert(outG.toSeq == Seq(3.0, 7.0))
  }
}
