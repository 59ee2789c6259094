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

  test("groups are independent") {
    val df = Seq((1L, 1L, 10.0), (2L, 2L, 20.0)).toDF("id", "g", "v")
    val out = Ewm.ewmMean(df, Seq("g"), Seq("id"), "v", "id", 0.5)
      .orderBy("id").collect().map(_.getDouble(1))
    assert(out.toSeq == Seq(10.0, 20.0))
  }
}
