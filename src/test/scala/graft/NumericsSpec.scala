package graft

import org.apache.spark.sql.functions._
import graft.numerics.{Curvefit, Spline}

/** Per-group iterative numerics: LM curvefit recovers known parameters;
  * natural cubic spline matches the tridiagonal reference solution. */
class NumericsSpec extends SparkSpec {
  import spark.implicits._

  test("curvefit: LM recovers a*exp(b*x) exactly on noiseless data") {
    val xs = (0 until 40).map(i => i * 5.0 / 39)
    val rows = for (g <- Seq(1L, 2L); x <- xs)
      yield (g, x, (if (g == 1) 2.0 else 0.5) * math.exp((if (g == 1) 0.3 else 0.8) * x))
    val df = rows.toDF("g", "x", "y")
    val fit = Curvefit.fit(df, Seq("g"), "x", "y",
      (p, x) => p(0) * math.exp(p(1) * x), p0 = Array(1.0, 0.1))
      .collect().map(r => r.getLong(0) -> (r.getDouble(1), r.getDouble(2))).toMap
    assert(math.abs(fit(1L)._1 - 2.0) < 1e-6 && math.abs(fit(1L)._2 - 0.3) < 1e-6,
      fit(1L).toString)
    assert(math.abs(fit(2L)._1 - 0.5) < 1e-6 && math.abs(fit(2L)._2 - 0.8) < 1e-6,
      fit(2L).toString)
  }

  test("natural cubic spline matches the reference tridiagonal solution") {
    val series = Seq((1L, 0.0, 0.0), (1L, 1.0, 1.0), (1L, 2.0, 8.0),
      (1L, 3.0, 27.0), (1L, 4.0, 64.0)).toDF("g", "t", "v")
    val probes = Seq((1L, 0.5), (1L, 1.5), (1L, 2.5), (1L, 3.7), (1L, 9.0))
      .toDF("g", "t")
    val out = Spline.interpCubic(series, probes, Seq("g"), "t", "v")
      .collect().map(r => r.getDouble(1) ->
        (if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toMap
    val want = Map(0.5 -> 0.09821428571428575, 1.5 -> 3.4553571428571432,
      2.5 -> 15.330357142857142, 3.7 -> 51.788500000000006)
    want.foreach { case (t, w) =>
      assert(out(t).isDefined && math.abs(out(t).get - w) < 1e-9, s"t=$t got ${out(t)}")
    }
    assert(out(9.0).isEmpty, "outside knot range must be NULL")
    // exact knot hit returns the knot value
    val knot = Spline.interpCubic(series, Seq((1L, 2.0)).toDF("g", "t"),
      Seq("g"), "t", "v").head
    assert(knot.getDouble(2) === 8.0)
  }
}
