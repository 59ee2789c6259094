package graft

import org.apache.spark.sql.functions._
import graft.llm.Pca

/** Distributed PCA: covariance long form vs a driver brute force, Jacobi
  * eigen laws (A·v = λ·v, orthonormality, trace), and end-to-end fit on a
  * planted dominant axis. */
class PcaSpec extends SparkSpec {
  import spark.implicits._

  test("jacobiEigen: known 2x2 and 3x3 spectra, laws hold") {
    val (v2, e2) = Pca.jacobiEigen(Array(Array(2.0, 1.0), Array(1.0, 2.0)))
    assert(math.abs(v2(0) - 3.0) < 1e-12 && math.abs(v2(1) - 1.0) < 1e-12)
    // eigenvector of 3 is (1,1)/sqrt(2), sign-normalized positive
    assert(math.abs(e2(0)(0) - math.sqrt(0.5)) < 1e-9 &&
      math.abs(e2(0)(1) - math.sqrt(0.5)) < 1e-9)

    val a = Array(
      Array(4.0, 1.0, 0.5),
      Array(1.0, 3.0, -0.25),
      Array(0.5, -0.25, 2.0))
    val (vals, vecs) = Pca.jacobiEigen(a)
    // descending order, trace preserved
    assert(vals.sorted.reverse.sameElements(vals))
    assert(math.abs(vals.sum - 9.0) < 1e-10)
    // A v = lambda v and orthonormality
    for (k <- 0 until 3) {
      val av = a.map(row => row.zip(vecs(k)).map { case (x, y) => x * y }.sum)
      av.zip(vecs(k)).foreach { case (x, y) =>
        assert(math.abs(x - vals(k) * y) < 1e-9) }
      for (l <- 0 until 3) {
        val dot = vecs(k).zip(vecs(l)).map { case (x, y) => x * y }.sum
        assert(math.abs(dot - (if (k == l) 1.0 else 0.0)) < 1e-9)
      }
    }
  }

  test("covariance long form equals the driver brute force") {
    val rows = Seq(
      Array(1.0f, 2.0f, 0.5f), Array(2.0f, 1.0f, 1.5f),
      Array(0.0f, 3.0f, -0.5f), Array(1.5f, 2.5f, 0.25f),
      Array(-1.0f, 0.5f, 2.0f))
    val df = rows.map(Tuple1(_)).toDF("embedding")
    val got = Pca.covariance(df, "embedding", 9).collect()
      .map(r => (r.getInt(0), r.getInt(1)) -> r.getDouble(2)).toMap
    val n = rows.length
    val mean = Array.tabulate(3)(i => rows.map(_(i).toDouble).sum / n)
    for (i <- 0 until 3; j <- i until 3) {
      val exp = rows.map(r =>
        (r(i) - mean(i)) * (r(j) - mean(j))).sum / (n - 1)
      assert(math.abs(got((i, j)) - exp) < 1e-6, s"cov($i,$j)")
    }
  }

  test("fit recovers a planted dominant axis; projection is scan-only") {
    // points spread along (3,4)/5 with small isotropic noise
    val axis = Array(0.6, 0.8)
    val rng = new scala.util.Random(7)
    val pts = (0 until 200).map { _ =>
      val t = rng.nextGaussian() * 10.0
      val (nx, ny) = (rng.nextGaussian() * 0.1, rng.nextGaussian() * 0.1)
      Array((t * axis(0) + nx).toFloat, (t * axis(1) + ny).toFloat)
    }
    val df = pts.map(Tuple1(_)).toDF("embedding")
    val (vals, vecs) = Pca.fit(df, "embedding", 2)
    assert(vals(0) > 50 * vals(1)) // dominant axis dominates
    assert(math.abs(math.abs(vecs(0)(0) * axis(0) + vecs(0)(1) * axis(1)) - 1.0)
      < 1e-3) // aligned with the planted direction
    val proj = Pca.project(df, "embedding", vecs)
    assert(proj.columns.toSeq == Seq("embedding", "pc0", "pc1"))
    // variance of pc0 matches the top eigenvalue (sample variance)
    val p0 = proj.select(col("pc0")).as[Double].collect()
    val m0 = p0.sum / p0.length
    val v0 = p0.map(x => (x - m0) * (x - m0)).sum / (p0.length - 1)
    assert(math.abs(v0 - vals(0)) / vals(0) < 1e-2)
    // no exchange in the projection plan: it is a pure scan-stage select
    val plan = proj.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"))
  }

  test("CovMoments aggregator is BIT-identical to the explode formulation") {
    val rng = new scala.util.Random(13)
    val pts = (0 until 300).map { _ =>
      Array.fill(8)((rng.nextGaussian() * 3.0).toFloat)
    }
    val df = pts.map(Tuple1(_)).toDF("embedding")
    def key(r: org.apache.spark.sql.Row) = (r.getInt(0), r.getInt(1))
    val agg = Pca.covariance(df, "embedding", 12).collect()
      .map(r => key(r) -> java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap
    val exp = Pca.covarianceExplode(df, "embedding", 12).collect()
      .map(r => key(r) -> java.lang.Double.doubleToRawLongBits(r.getDouble(2))).toMap
    assert(agg.keySet === exp.keySet)
    // raw bit equality — the decimal grids must coincide exactly
    agg.foreach { case (k, bits) => assert(bits === exp(k), s"cell $k") }
  }

  test("covariance rejects fewer than 2 rows loudly") {
    val df = Seq(Tuple1(Array(1.0f, 2.0f))).toDF("embedding")
    val ex = intercept[IllegalArgumentException] {
      Pca.covariance(df, "embedding")
    }
    assert(ex.getMessage.contains("covariance needs >= 2 rows"))
  }

  test("d=512: one-pass aggregator avoids the d^2-row explode blow-up") {
    // 64 rows x d=512 -> the explode path materializes 64 * 131,841
    // ~ 8.4M product rows through two generators + a 131k-group hash
    // aggregate; the aggregator runs the same products in-buffer. The
    // scale property is STRUCTURAL (no row-multiplying Generate in the
    // plan) — wall-clock ratios flake under parallel suite load, so
    // timings are informational only.
    val rng = new scala.util.Random(31)
    val pts = (0 until 64).map(_ => Array.fill(512)(rng.nextFloat() - 0.5f))
    val df = pts.map(Tuple1(_)).toDF("embedding").cache()
    df.count()
    def time(f: => Unit): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    val agg = Pca.covariance(df, "embedding", 9)
    val exp = Pca.covarianceExplode(df, "embedding", 9)
    val tAgg = time { agg.count() }
    val tExp = time { exp.count() }
    info(f"d=512: aggregator $tAgg%.2fs vs explode $tExp%.2fs " +
      f"(${tExp / tAgg}%.1fx)")
    // a Generate is only a blow-up when it runs BELOW the aggregate (per
    // data row); the aggregator's sole Generate is the inline() on the
    // 1-row aggregate result (bounded (d+1)(d+2)/2 rows)
    import org.apache.spark.sql.execution.SparkPlan
    def hasAgg(p: SparkPlan): Boolean =
      p.toString.linesIterator.next().contains("Aggregate") ||
        p.children.exists(hasAgg)
    def preAggGenerates(p: SparkPlan): Int = {
      val self = p.getClass.getSimpleName.contains("Generate") &&
        !p.children.exists(hasAgg)
      (if (self) 1 else 0) + p.children.map(preAggGenerates).sum +
        (p match {
          case im: org.apache.spark.sql.execution.columnar.InMemoryTableScanExec =>
            preAggGenerates(im.relation.cachedPlan)
          case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
            preAggGenerates(a.inputPlan)
          case _ => 0
        })
    }
    assert(preAggGenerates(agg.queryExecution.executedPlan) == 0,
      "covariance must not materialize product ROWS (no pre-aggregate " +
        "Generate)")
    assert(preAggGenerates(exp.queryExecution.executedPlan) > 0,
      "explode reference formulation should carry the pre-aggregate " +
        "Generate it pins the aggregator against")
    df.unpersist()
  }
}
