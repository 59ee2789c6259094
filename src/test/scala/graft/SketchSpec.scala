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
