package graft

import org.apache.spark.sql.functions._
import graft.llm.{CorpusStats, Sampling, Sketch}

/** Count-min sketch laws (est >= truth, exactness when w exceeds the
  * vocabulary spread, determinism), bottom-k sample mergeability, and
  * source-overlap vs a driver brute force. */
class SketchSpec extends SparkSpec {
  import spark.implicits._

  private def tokens(rows: Seq[String]) = rows.toDF("tok")

  test("CMS: estimate >= exact count for every token, and is exact when " +
    "no collisions land in a row") {
    val data = Seq.fill(40)("alpha") ++ Seq.fill(25)("beta") ++
      Seq.fill(9)("gamma") ++ (1 to 30).map(i => s"tail$i")
    val toks = tokens(data)
    val sk = Sketch.countMin(toks, "tok", w = 512).cache()
    val probes = toks.distinct()
    val est = Sketch.estimate(sk, probes, "tok", w = 512)
    val exact = toks.groupBy("tok").agg(count(lit(1)).as("n"))
    val joined = est.join(exact, "tok").collect()
    assert(joined.length == 33)
    joined.foreach { r =>
      assert(r.getAs[Long]("est") >= r.getAs[Long]("n"),
        s"CMS under-counted ${r.getAs[String]("tok")}")
    }
    // d=4 independent rows over w=512 cells vs 33 keys: the min row is
    // collision-free for the heavy tokens in this fixture
    val heavy = joined.filter(r => r.getAs[Long]("n") >= 9)
    assert(heavy.forall(r => r.getAs[Long]("est") == r.getAs[Long]("n")),
      "heavy hitters should estimate exactly at this (d, w, |V|)")
  }

  test("CMS is deterministic: two independent builds agree cell-for-cell") {
    val toks = tokens((1 to 200).map(i => s"t${i % 37}"))
    val a = Sketch.countMin(toks, "tok", w = 128)
      .orderBy("row", "cell").collect().toSeq
    val b = Sketch.countMin(toks, "tok", w = 128)
      .orderBy("row", "cell").collect().toSeq
    assert(a == b)
  }

  test("KMV set ops: exact when the union fits in k; estimates bounded " +
    "and Jaccard exact-ppm on the sketch") {
    // two strata with 30 distinct tokens each, 10 shared -> union 50 < k
    val rows = (1 to 20).map(i => ("s1", s"only_a_$i")) ++
      (1 to 20).map(i => ("s2", s"only_b_$i")) ++
      (1 to 10).flatMap(i => Seq(("s1", s"shared_$i"), ("s2", s"shared_$i")))
    val toks = rows.toDF("src", "tok")
    val r = Sketch.kmvPairs(toks, "src", "tok", k = 64).collect()
    assert(r.length == 1)
    val row = r.head
    assert(row.getAs[String]("s1") == "s1" && row.getAs[String]("s2") == "s2")
    // |union| = 50 < 64: the sketch IS the union -> everything exact
    assert(row.getAs[Long]("m") == 50L)
    assert(row.getAs[Long]("union_est") == 50L)
    assert(row.getAs[Long]("n_both") == 10L)
    assert(row.getAs[Long]("jaccard_ppm") == 10L * 1000000L / 50L)
    assert(row.getAs[Long]("inter_est") == 10L * 50L / 50L)
  }

  test("KMV estimate path: k-th minimum drives the estimate and brackets " +
    "the truth within the KMV error bound") {
    val nA = 600; val nB = 600; val shared = 200
    val rows = (1 to nA).map(i => ("x", s"a_$i")) ++
      (1 to nB).map(i => ("y", s"b_$i")) ++
      (1 to shared).flatMap(i => Seq(("x", s"c_$i"), ("y", s"c_$i")))
    val k = 64
    val r = Sketch.kmvPairs(rows.toDF("src", "tok"), "src", "tok", k)
      .head()
    val trueUnion = nA + nB + shared // 1400 distinct
    assert(r.getAs[Long]("m") == k)
    val est = r.getAs[Long]("union_est")
    // (k-1)/h_k concentrates within ~4/sqrt(k) ≈ 50% at k=64 — loose
    // bracket, deterministic fixture so this pins behavior not luck
    assert(est > trueUnion / 2 && est < trueUnion * 2,
      s"union_est $est vs true $trueUnion")
  }

  test("histogramQuantile: rank targets bracket the bin and the ppm " +
    "interpolation is the exact integer formula") {
    val vals = (1 to 1000).map(_.toLong) // uniform 1..1000, width 100
    val df = vals.toDF("v")
    val r = Sketch.histogramQuantile(df, "v", width = 100L,
        qPcts = Seq(50, 90))
      .orderBy("q_pct").collect()
    assert(r.length == 2)
    val p50 = r(0)
    // target = (50*1000+99) div 100 = 500; bins 0..10 (v=1000 -> bin 10);
    // bin 4 covers 400..499 with cum 499 (values 1..499), bin 5 cum 599
    assert(p50.getAs[Long]("target_rank") == 500L)
    assert(p50.getAs[Long]("bin") == 5L)
    assert(p50.getAs[Long]("lo") == 500L)
    // est_ppm = 500*1e6 + (100*(500-499)*1e6) div 100 = 501e6 exactly
    assert(p50.getAs[Long]("est_ppm") == 501000000L)
    val p90 = r(1)
    assert(p90.getAs[Long]("target_rank") == 900L)
    assert(p90.getAs[Long]("bin") == 9L)
  }

  test("histogram sketch merges by cell addition: histogram of a union " +
    "equals the cell-wise sum of part histograms") {
    val a = (1 to 500).map(_.toLong).toDF("v")
    val b = (300 to 800).map(_.toLong).toDF("v")
    def hist(d: org.apache.spark.sql.DataFrame) =
      d.select(expr("v div 100").as("bin")).groupBy("bin")
        .agg(count(lit(1)).as("cnt"))
    val merged = hist(a.union(b)).orderBy("bin").collect().toSeq
    val summed = hist(a).union(hist(b))
      .groupBy("bin").agg(sum("cnt").as("cnt")).orderBy("bin")
      .collect().toSeq
    assert(merged.map(r => (r.getLong(0), r.getLong(1))) ==
      summed.map(r => (r.getLong(0), r.getLong(1))))
  }

  test("bottom-k is mergeable: bottom-k of a union == bottom-k of the " +
    "parts' bottom-k's (KMV property)") {
    val part1 = (1L to 60L).map(i => (i, "s"))
    val part2 = (61L to 120L).map(i => (i, "s"))
    val all = (part1 ++ part2).toDF("doc_id", "source")
    val direct = Sampling.bottomK(all, "doc_id", "source", 7)
      .select("doc_id").as[Long].collect().toSet
    val merged = Sampling.bottomK(
      Sampling.bottomK(part1.toDF("doc_id", "source"), "doc_id", "source", 7)
        .drop("rk")
        .unionByName(Sampling.bottomK(part2.toDF("doc_id", "source"),
          "doc_id", "source", 7).drop("rk")),
      "doc_id", "source", 7)
      .select("doc_id").as[Long].collect().toSet
    assert(direct == merged && direct.size == 7)
  }

  test("bottom-k respects strata and k") {
    val df = (1L to 100L).map(i => (i, s"s${i % 4}")).toDF("doc_id", "source")
    val got = Sampling.bottomK(df, "doc_id", "source", 3)
      .groupBy("source").agg(count(lit(1)).as("n")).collect()
    assert(got.length == 4 && got.forall(_.getAs[Long]("n") == 3L))
  }

  test("source overlap equals a driver brute force on string shingles") {
    val docs = Seq(
      ("a", "the quick brown fox jumps over the lazy dog"),
      ("a", "pack my box with five dozen liquor jugs"),
      ("b", "the quick brown fox jumps over a sleeping cat"),
      ("c", "completely different text with no shared trigrams at all"))
      .toDF("source", "text")
    val got = CorpusStats.sourceOverlap(docs, "source", "text", 3)
      .orderBy("src_a", "src_b").collect()
    def shingles(ts: Seq[String]): Set[String] = ts.flatMap { t =>
      val w = t.toLowerCase.trim.split("\\s+").toSeq
      (0 to math.max(w.length - 3, 0)).map(i =>
        w.slice(i, math.min(i + 3, w.length)).mkString(" "))
    }.toSet
    val bySrc = Seq("a", "b", "c").map(s0 => s0 -> shingles(
      docs.filter(col("source") === s0).select("text").as[String]
        .collect().toSeq)).toMap
    val expect = for {
      Seq(x, y) <- Seq("a", "b", "c").combinations(2).toSeq
      inter = (bySrc(x) & bySrc(y)).size
      if inter > 0
    } yield (x, y, inter.toLong,
      inter.toLong * 1000000L / (bySrc(x) | bySrc(y)).size)
    assert(got.map(r => (r.getString(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSeq.sorted == expect.sorted)
  }
}
