package graft

import org.apache.spark.sql.functions._
import graft.exprs.HFQuantile

/** All nine Hyndman & Fan methods vs numpy reference values
  * (np.quantile(method=...), the kernel behind `variable.py:1929`). */
class HFQuantileSpec extends SparkSpec {
  import spark.implicits._

  private val xs = Seq(2.0, 7.0, 1.0, 8.0, 2.0, 8.0, 1.0, 9.0, 5.0, 3.0)

  // (method, q, expected) — generated from numpy 1.x np.quantile
  private val expected = Seq(
    (1, 0.25, 2.0), (1, 0.5, 3.0), (1, 0.9, 8.0),
    (2, 0.25, 2.0), (2, 0.5, 4.0), (2, 0.9, 8.5),
    (3, 0.25, 2.0), (3, 0.5, 3.0), (3, 0.9, 8.0),
    (4, 0.25, 1.5), (4, 0.5, 3.0), (4, 0.9, 8.0),
    (5, 0.25, 2.0), (5, 0.5, 4.0), (5, 0.9, 8.5),
    (6, 0.25, 1.75), (6, 0.5, 4.0), (6, 0.9, 8.9),
    (7, 0.25, 2.0), (7, 0.5, 4.0), (7, 0.9, 8.1),
    (8, 0.25, 1.9166666666666665), (8, 0.5, 4.0), (8, 0.9, 8.633333333333333),
    (9, 0.25, 1.9375), (9, 0.5, 4.0), (9, 0.9, 8.6))

  test("all 9 H&F methods match numpy") {
    val df = xs.toDF("x")
    expected.foreach { case (m, q, want) =>
      val got = df.agg(HFQuantile(col("x"), q, m)).head.getDouble(0)
      assert(math.abs(got - want) < 1e-12, s"method=$m q=$q: got $got want $want")
    }
  }

  test("NULLs are skipped (skipna) and empty groups give NULL") {
    val df = Seq[java.lang.Double](1.0, null, 3.0).toDF("x")
    val got = df.agg(HFQuantile(col("x"), 0.5, 7)).head.getDouble(0)
    assert(got === 2.0)
    val empty = Seq.empty[java.lang.Double].toDF("x")
    assert(empty.agg(HFQuantile(col("x"), 0.5, 7)).head.isNullAt(0))
  }

  test("vectorized q array equals per-q singles for every method") {
    val df = xs.toDF("x")
    val qs = Seq(0.25, 0.5, 0.9)
    (1 to 9).foreach { m =>
      val arr = df.agg(HFQuantile.multi(col("x"), qs, m)).head
        .getSeq[Double](0)
      qs.zipWithIndex.foreach { case (q, i) =>
        val single = df.agg(HFQuantile(col("x"), q, m)).head.getDouble(0)
        assert(arr(i) === single, s"method=$m q=$q: multi=${arr(i)} single=$single")
      }
    }
    val empty = Seq.empty[java.lang.Double].toDF("x")
    assert(empty.agg(HFQuantile.multi(col("x"), qs, 7)).head.isNullAt(0))
  }
}
