package graft

import org.apache.spark.sql.functions._
import graft.llm.{Retrieval, Similarity}

/** BM25 / RRF / PQ-ADC retrieval semantics on hand-checkable corpora. */
class RetrievalSpec extends SparkSpec {

  import spark.implicits._

  test("bm25: term-frequency and length normalization rank as Okapi says") {
    // doc 1: two hits of 'spark' in 4 tokens; doc 2: one hit in 4; doc 3:
    // one hit diluted in 8 tokens; doc 4: no query terms at all
    val docs = Seq(
      (1L, "spark spark x y"),
      (2L, "spark a b c"),
      (3L, "spark a b c d e f g"),
      (4L, "nothing relevant here at all")).toDF("doc_id", "text")
    val out = Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("spark"), k = 10).collect().sortBy(_.getInt(1))
    assert(out.map(_.getLong(0)).toSeq == Seq(1L, 2L, 3L)) // 4 drops out
    assert(out.map(_.getInt(1)).toSeq == Seq(1, 2, 3))
    // same tf, longer doc => strictly smaller score (the b·dl/avgdl term)
    val score = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(score(2L) > score(3L) && score(1L) > score(2L))
  }

  test("bm25: multi-term scores add per-term contributions once each") {
    val docs = Seq(
      (1L, "spark window"),
      (2L, "spark spark"),
      (3L, "window window")).toDF("doc_id", "text")
    val both = Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("spark", "window"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val sparkOnly = Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("spark"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    val winOnly = Retrieval.bm25TopK(docs, "doc_id", "text",
      terms = Seq("window"), k = 10).collect()
      .map(r => r.getLong(0) -> r.getDouble(2)).toMap
    // doc 1 holds one of each: its two-term score is the sum of its
    // single-term scores (fixed-order add, rounding at 6 dp)
    assert(math.abs(both(1L) - (sparkOnly(1L) + winOnly(1L))) < 2e-6)
    assert(both.keySet == Set(1L, 2L, 3L))
  }

  test("rrf: fusion favors ids present in both lists; singletons survive") {
    val a = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rk")
    val b = Seq((20L, 1), (40L, 2)).toDF("id", "rk")
    val out = Retrieval.rrfFuse(a, b, "id", "rk", k = 10).collect()
      .sortBy(_.getInt(1))
    val byId = out.map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(byId(20L) == 1.0 / 62 + 1.0 / 61)       // both lists
    assert(byId(10L) == 1.0 / 61)                  // a only
    assert(byId(40L) == 1.0 / 62)                  // b only
    assert(out.head.getLong(0) == 20L)             // fusion wins
    assert(out.map(_.getInt(1)).toSeq == (1 to out.length).toSeq)
  }

  test("pq-adc: exact on codebook members; codes bounded; top-1 sane") {
    val dim = 8
    // corpus rows 0..3 are the codebook (ksub=4); rows 4..7 are noisy
    // copies of them — PQ must send each noisy copy's top-1 to itself or
    // its clean source (quantization folds both onto the same codes)
    val rnd = new scala.util.Random(7)
    val base = Array.fill(4)(Array.fill(dim)(rnd.nextFloat() * 2 - 1))
    val rows = (0 until 4).map(i => (i.toLong, base(i).toSeq)) ++
      (0 until 4).map(i => (4L + i,
        base(i).map(x => x + (rnd.nextFloat() - 0.5f) * 1e-3f).toSeq))
    val corpus = rows.toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") >= 4)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val out = Similarity.pqTopK(corpus, probes, "vec_id", "probe_id",
      "embedding", dim = dim, m = 2, ksub = 4, k = 2).collect()
    val top1 = out.filter(_.getInt(1) == 1)
      .map(r => r.getLong(0) -> r.getLong(2)).toMap
    // ADC scores collapse each noisy copy and its source onto identical
    // codes, so top-1 is the tie-break winner: the lower corpus id, i.e.
    // the clean source vector
    (0 until 4).foreach { i => assert(top1(4L + i) == i.toLong) }
  }

  test("ivf-pq: exact scores when residuals coincide with codebook rows") {
    // centroids far apart; every corpus row = centroid + one of two
    // residual patterns, and the codebook (residuals of rows 0,1) contains
    // exactly those patterns per sub-space -> PQ reconstruction is EXACT,
    // so each score must equal the plain inner product probe . candidate
    val corpus = Seq(
      (0L, Seq(11f, 0f, 0f, 1f)),   // c0 + (1,0,0,1)
      (1L, Seq(10f, 1f, 1f, 0f)),   // c0 + (0,1,1,0)
      (2L, Seq(1f, 0f, 10f, 1f)),   // c1 + (1,0,0,1)
      (3L, Seq(0f, 1f, 11f, 0f))    // c1 + (0,1,1,0)
    ).toDF("vec_id", "embedding")
    val centroids = Seq(
      (0L, Seq(10f, 0f, 0f, 0f)),
      (1L, Seq(0f, 0f, 10f, 0f))).toDF("cell_id", "cell_vec")
    val assigned = Similarity.ivfAssign(corpus, centroids, "vec_id",
      "embedding", "cell_id", "cell_vec")
    val probes = assigned
      .select(col("vec_id").as("probe_id"), col("embedding").as("__qv"),
        col("cell_id"))
    val out = Similarity.ivfPqTopK(assigned, centroids, probes, "vec_id",
      "embedding", "cell_id", "cell_vec", "probe_id", "__qv",
      dim = 4, m = 2, ksub = 2, k = 2).collect()
    val vecs = Map(
      0L -> Seq(11.0, 0.0, 0.0, 1.0), 1L -> Seq(10.0, 1.0, 1.0, 0.0),
      2L -> Seq(1.0, 0.0, 10.0, 1.0), 3L -> Seq(0.0, 1.0, 11.0, 0.0))
    def dot(a: Seq[Double], b: Seq[Double]) =
      a.zip(b).map { case (x, y) => x * y }.sum
    // each probe sees exactly its cell's 2 candidates, scored exactly
    assert(out.length == 8)
    out.foreach { r =>
      val (p, c, s) = (r.getLong(0), r.getLong(2), r.getDouble(3))
      assert(math.abs(s - dot(vecs(p), vecs(c))) < 1e-12,
        s"probe $p cand $c: got $s want ${dot(vecs(p), vecs(c))}")
      assert((p < 2) == (c < 2)) // candidates stay in the probe's cell
    }
  }

  test("hard negatives: self and near-duplicates excluded by the ceiling") {
    val corpus = Seq(
      (0L, Seq(1f, 0f)),
      (1L, Seq(0.999f, 0.045f)), // near-dup of 0 (cos ~0.999)
      (2L, Seq(0.7f, 0.7f)),     // the hard negative (cos ~0.707)
      (3L, Seq(0f, 1f))          // easy negative (cos 0)
    ).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val out = Similarity.hardNegatives(corpus, probes, "vec_id",
      "probe_id", "embedding", k = 2, dupCeil = 0.99)
      .collect().sortBy(_.getInt(1)).map(_.getLong(2)).toSeq
    assert(out == Seq(2L, 3L), s"got $out") // 0 (self) and 1 (dup) gone
  }

  test("convex fusion: per-list min-max normalization; constant list -> 1") {
    val a = Seq((1L, 10.0), (2L, 20.0)).toDF("id", "score")
    val b = Seq((2L, 5.0), (3L, 5.0)).toDF("id", "score") // constant list
    val out = Retrieval.convexFuse(a, b, "id", "score", alpha = 0.5, k = 10)
      .collect().sortBy(_.getInt(1))
      .map(r => (r.getLong(0), r.getDouble(2)))
    // a normalizes to {1:0, 2:1}; b (constant) to {2:1, 3:1}
    assert(out.toSeq == Seq((2L, 1.0), (3L, 0.5), (1L, 0.0)), s"got ${out.toSeq}")
  }

  test("mmr: diversification demotes the near-duplicate of the first pick") {
    // c1 most relevant; c2 nearly identical to c1 but slightly less
    // relevant; c3 less relevant but orthogonal. Pure relevance would
    // rank c1, c2, c3 — MMR at lambda=0.5 must pick c1, c3, c2.
    val cands = Seq(
      (10L, 1L, 0.90, Seq(1f, 0f)),
      (10L, 2L, 0.89, Seq(0.999f, 0.045f)),
      (10L, 3L, 0.50, Seq(0f, 1f)),
      // second probe in the same partition space: order flips on rel
      (11L, 4L, 0.30, Seq(1f, 0f)),
      (11L, 5L, 0.80, Seq(0f, 1f))
    ).toDF("probe_id", "vec_id", "rel", "embedding")
    val out = Retrieval.mmrRerank(cands, "probe_id", "vec_id", "rel",
      "embedding", lambda = 0.5, k = 3)
      .collect().map(r =>
        (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    val p10 = out.filter(_._1 == 10L).sortBy(_._2).map(_._3).toSeq
    assert(p10 == Seq(1L, 3L, 2L), s"got $p10")
    val p11 = out.filter(_._1 == 11L).sortBy(_._2).map(_._3).toSeq
    assert(p11 == Seq(5L, 4L), s"got $p11")
    // first pick's score is exactly lambda*rel (no penalty term yet)
    assert(out.find(r => r._1 == 10L && r._2 == 1).get._4 == 0.5 * 0.90)
    // second pick of probe 10: orthogonal c3 scores 0.25 - 0.5*cos(c3,c1)
    val s2 = out.find(r => r._1 == 10L && r._2 == 2).get._4
    assert(math.abs(s2 - 0.25) < 1e-9, s"got $s2")
  }

  test("pq-adc: assignment tie-breaks to the lowest code") {
    // two identical codebook vectors: every row must code to the FIRST
    val corpus = Seq(
      (0L, Seq(1f, 0f, 0f, 1f)),
      (1L, Seq(1f, 0f, 0f, 1f)),
      (2L, Seq(0.9f, 0.1f, 0.2f, 0.8f))).toDF("vec_id", "embedding")
    val probes = corpus.filter(col("vec_id") === 2)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val out = Similarity.pqTopK(corpus, probes, "vec_id", "probe_id",
      "embedding", dim = 4, m = 2, ksub = 2, k = 3).collect()
    // rows 0 and 1 share codes => identical scores; rank breaks by id
    val r = out.sortBy(_.getInt(1)).map(r => (r.getLong(2), r.getDouble(3)))
    assert(r(0)._2 == r(1)._2)
    assert(r(0)._1 == 0L && r(1)._1 == 1L)
  }

  test("query likelihood: tf raises score, length penalizes, no-match prunes") {
    import spark.implicits._
    val docs = Seq(
      (1L, "spark spark merge"),       // tf(spark)=2 in len 3
      (2L, "spark merge"),             // tf(spark)=1 in len 2
      (3L, "spark merge x x x x x x"), // same tfs, longer doc
      (4L, "other words only")         // no query term -> pruned
    ).toDF("doc_id", "text")
    val out = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      terms = Seq("spark", "merge"), k = 10, mu = 10.0)
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.getDouble(2)))
      .toMap
    assert(!out.contains(4L), "no-match doc must be pruned")
    // doc 1 beats doc 2 (more spark mass in a similar length); doc 3's
    // extra length dilutes both terms below doc 2
    assert(out(1L)._2 > out(2L)._2 && out(2L)._2 > out(3L)._2)
    assert(out(1L)._1 === 1 && out(3L)._1 === 3)
  }

  test("query likelihood: a corpus-OOV term is ignored, not score-nulling") {
    import spark.implicits._
    val docs = Seq((1L, "spark merge"), (2L, "spark x")).toDF("doc_id", "text")
    val out = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      terms = Seq("spark", "zzznotincorpus"), k = 10, mu = 10.0)
      .collect()
    assert(out.length === 2)
    // scores are finite non-null: the OOV term contributed exactly 0
    out.foreach(r => assert(!r.isNullAt(2) && !r.getDouble(2).isNaN))
    val only = Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      terms = Seq("spark"), k = 10, mu = 10.0)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    out.foreach(r => assert(r.getDouble(2) === only(r.getLong(0))))
  }

  test("ndcg: duplicate judgment rows collapse to max, never double-count") {
    import spark.implicits._
    val dupRels = Seq((10L, 3), (10L, 1), (11L, 2)).toDF("id", "rel")
    val ranked = Seq((10L, 1), (11L, 2)).toDF("id", "rk")
    val r = Retrieval.ndcgAtK(ranked, dupRels, "id", "rk", "rel", k = 2)
      .head()
    // with dedup-to-max this ranking is ideal -> ndcg exactly 1
    assert(r.getDouble(3) === 1.0)
    assert(r.getDouble(1) === r.getDouble(2))
  }

  test("ndcg: perfect ranking scores 1, reversed ranking scores less") {
    import spark.implicits._
    val rels = Seq((10L, 3), (11L, 2), (12L, 0)).toDF("id", "rel")
    val perfect = Seq((10L, 1), (11L, 2), (12L, 3)).toDF("id", "rk")
    val reversed = Seq((12L, 1), (11L, 2), (10L, 3)).toDF("id", "rk")
    val p = Retrieval.ndcgAtK(perfect, rels, "id", "rk", "rel", k = 3)
      .head()
    assert(p.getDouble(3) === 1.0)
    assert(p.getDouble(1) === p.getDouble(2)) // dcg == idcg
    val rv = Retrieval.ndcgAtK(reversed, rels, "id", "rk", "rel", k = 3)
      .head().getDouble(3)
    assert(rv < 1.0 && rv > 0.0)
    // unknown id contributes rel=0, lowering DCG but not crashing
    val withUnknown = Seq((99L, 1), (10L, 2)).toDF("id", "rk")
    val u = Retrieval.ndcgAtK(withUnknown, rels, "id", "rk", "rel", k = 3)
      .head()
    assert(u.getDouble(3) < 1.0)
  }
}
