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
}
