package graft

import org.apache.spark.sql.functions._
import graft.llm.{Dedup, Similarity, TextAnalysis}

/** Dedup / similarity laws: identical documents must collide everywhere;
  * Jaccard arithmetic is exact. */
class DedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat"),   // near dup
    (4L, "completely different words entirely here now")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() === 3)
    assert(out.filter(col("n_dups") === 2).select("keep_id")
      .as[Long].head() === 1L)
  }

  test("identical docs share minhash signatures; lsh finds the pair") {
    val sig = docs.withColumn("sh", Dedup.shingles(col("text"), 2))
      .withColumn("sig", Dedup.minhashSignature(col("sh"), 16))
    val s = sig.select("doc_id", "sig").as[(Long, Seq[Long])].collect().toMap
    assert(s(1L) === s(2L))
    assert(s(1L) !== s(4L))
    val pairs = Dedup.candidatePairs(
      Dedup.lshBuckets(sig, "doc_id", "sig", bands = 4, rowsPerBand = 4),
      "doc_id")
    val found = pairs.as[(Long, Long)].collect().toSet
    assert(found.contains((1L, 2L)))
  }

  test("candidatePairs enforces the bucket-depth cap (blocking-key sizing law)") {
    // a planted hub: 50 ids share one (band, bucket) value — the
    // degenerate-value shape that turns the LSH equi-join quadratic at
    // corpus scale — plus one honest pair in another band
    val hub = (1L to 50L).map(i => (0, 7L, i))
    val pair = Seq((1, 9L, 100L), (1, 9L, 200L))
    val buckets = (hub ++ pair).toDF("band", "bucket", "doc_id")
    val capped = Dedup.candidatePairs(buckets, "doc_id", maxBucket = 10)
      .as[(Long, Long)].collect().toSet
    // the hub band emits NOTHING; the honest pair still surfaces
    assert(capped === Set((100L, 200L)))
    // and an uncapped run proves what the cap prevented: 50*49/2 + 1 pairs
    val uncapped = Dedup.candidatePairs(buckets, "doc_id").count()
    assert(uncapped === 50L * 49 / 2 + 1)
  }

  test("jaccard verify computes exact shingle jaccard") {
    val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("id_a", "id_b")
    val m = Dedup.jaccardVerify(pairs, docs, "doc_id", "text", 2, 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(m((1L, 2L)) === 1.0)
    assert(m((1L, 3L)) > 0.5 && m((1L, 3L)) < 1.0)
    assert(!m.contains((1L, 4L)) || m((1L, 4L)) === 0.0)
  }

  test("simhash: identical docs distance 0; different docs far") {
    val sh = Dedup.simhash(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(2L)) === 0)
    assert(java.lang.Long.bitCount(sh(1L) ^ sh(4L)) > 10)
  }

  test("fingerprint is order/case/whitespace insensitive") {
    val d2 = Seq((1L, "b a  c"), (2L, "A   c b"), (3L, "a b d")).toDF("doc_id", "text")
    val fp = d2.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp"))
      .as[(Long, String)].collect().toMap
    assert(fp(1L) === fp(2L))
    assert(fp(1L) !== fp(3L))
  }

  test("codegen dotF32 matches interpreted decimal dot to 1e-9") {
    import graft.exprs.VectorExprs
    import graft.numerics.Numerics
    val vecs = Seq((0L, Array(1.0f, 2.0f, 3.0f)), (1L, Array(-0.5f, 0.25f, 4.0f)))
      .toDF("vec_id", "embedding")
    val out = vecs.select(
      VectorExprs.dotF32(col("embedding"), col("embedding")).as("fast"),
      Numerics.dotDecimal(col("embedding"), col("embedding")).as("exact"))
      .collect()
    out.foreach { r =>
      assert(math.abs(r.getDouble(0) - r.getDouble(1)) < 1e-9, r.toString)
    }
  }

  test("brute-force topk ranks self first with cosine ~1") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f)), (1L, Array(0.9f, 0.1f)), (2L, Array(0.0f, 1.0f))
    ).toDF("vec_id", "embedding")
    val probes = vecs.filter(col("vec_id") === 0)
      .select(col("vec_id").as("probe_id"), col("embedding"))
    val out = Similarity.bruteForceTopK(vecs, probes, "vec_id", "probe_id",
      "embedding", 3).orderBy("rk")
      .select("vec_id").as[Long].collect()
    assert(out.toSeq === Seq(0L, 1L, 2L))
  }

  test("ngramJaccard df-cap drops only stop-gram pairs (anti-join fires)") {
    // every doc shares the bigram "zz yy" (df=5); only docs 1 and 2 share
    // anything else. With the cap above 5 the stop-gram connects all 10
    // pairs; with cap=4 the anti-join removes it and only the (1,2) pair
    // survives, scored against FULL gram sizes (intersection-only loss).
    val docs = Seq(
      (1L, "s", "zz yy alpha beta"),
      (2L, "s", "zz yy alpha beta"),
      (3L, "s", "zz yy cat dog"),
      (4L, "s", "zz yy bird fish"),
      (5L, "s", "zz yy moon star")
    ).toDF("doc_id", "source", "text")
    val uncapped = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
      n = 2, gramDfCap = 100L).collect()
    assert(uncapped.length === 10, "stop-gram connects every pair")
    val capped = Dedup.ngramJaccard(docs, "doc_id", "text", "source",
      n = 2, gramDfCap = 4L)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(capped.length === 1, s"only the (1,2) pair shares non-stop grams: ${capped.toSeq}")
    val (a, b, j) = capped.head
    assert(a === 1L && b === 2L)
    // c=2 ("yy alpha","alpha beta"), sizes stay 3: j = 2/(3+3-2)
    assert(math.abs(j - 0.5) < 1e-12)
  }

  test("duplicateFamilies closes the A~B~C chain transitively") {
    import spark.implicits._
    val s1 = "alpha bravo charlie delta echo foxtrotZ " // 40 chars
    val s2 = "golf hotel india juliett kilo lima mike " // 40 chars
    assert(s1.length == 40 && s2.length == 40)
    val docs = Seq(
      (1L, s1 + "tail only in doc one, long enough here"),
      (2L, s1 + s2), // bridges: shares s1 with 1, s2 with 3
      (3L, "prefix10x " + s2 + "unrelated tail for document three"),
      (4L, "isolated document with no shared spans at all, filler")
    ).toDF("doc_id", "text")
    val fams = Dedup.duplicateFamilies(docs, "doc_id", "text",
        gramLen = 40, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    // doc 3's copy of s2 starts at offset 10 (stride-aligned); 1-2-3 chain
    assert(fams == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $fams")
  }

  test("connectedComponents separates disjoint components") {
    import spark.implicits._
    val pairs = Seq((10L, 20L), (20L, 30L), (40L, 50L))
      .toDF("id_a", "id_b")
    val cc = Dedup.connectedComponents(pairs, "id_a", "id_b")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(cc == Map(10L -> 10L, 20L -> 10L, 30L -> 10L,
      40L -> 40L, 50L -> 40L))
  }

  test("duplicateSpans flags only the planted shared 40-char span") {
    import spark.implicits._
    val span = "the quick brown fox jumps over the lazy" + " " // 40 chars
    assert(span.length == 40)
    val docs = Seq(
      // span at offset 0 and offset 10 (both stride-aligned)
      (1L, span + "unique tail one that goes on for a while"),
      (2L, "padding10x" + span + "different tail two, also long enough"),
      (3L, "no duplicated content here at all, just filler text to pass"),
      (4L, "short doc") // below gramLen -> excluded entirely
    ).toDF("doc_id", "text")
    val out = Dedup.duplicateSpans(docs, "doc_id", "text",
        gramLen = 40, stride = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toList
      .sortBy(_._1)
    // docs 1 and 2 share the exact window; 3 and 4 emit nothing
    assert(out.map(_._1) == List(1L, 2L), s"got $out")
    assert(out(0)._3 == 0 && out(1)._3 == 10) // first duplicated offset
    assert(out.forall(_._2 >= 1L))
  }

  test("incremental dedup: index collisions drop; batch keeper elected") {
    val existing = Seq((1L, "seen before"), (2L, "also seen"))
      .toDF("doc_id", "text")
    val incoming = Seq(
      (10L, "Seen   before"), // normalizes onto the index key -> dropped
      (11L, "fresh one"),     // kept
      (12L, "fresh one"),     // batch dup of 11 -> folded into the keeper
      (13L, "another")).toDF("doc_id", "text")
    val out = Dedup.incrementalDedup(existing, incoming, "doc_id", "text")
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(out == Map(11L -> 2L, 13L -> 1L))
  }

  test("segment dedup keeps globally-first occurrences and reassembles") {
    // 2-token segments: doc 1 = [a b][c d], doc 2 repeats [a b] then adds
    // [e f]; doc 3 is entirely segments seen earlier and must vanish
    val d = Seq(
      (1L, "a b c d"),
      (2L, "a b e f"),
      (3L, "a b c d")).toDF("doc_id", "text")
    val out = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    assert(out.keySet == Set(1L, 2L))                  // doc 3 vanished
    assert(out(1L) == ((2L, 2L, "a b c d")))           // first owner keeps all
    assert(out(2L) == ((2L, 1L, "e f")))               // repeated [a b] cut
  }

  test("segment dedup: within-doc repeats keep only the first; partial tail") {
    // 5 tokens at segTokens=2 -> segments [x y][x y][z]: the second [x y]
    // is a within-doc duplicate, the 1-token tail survives as its own
    // segment
    val d = Seq((7L, "x y x y z")).toDF("doc_id", "text")
    val r = Dedup.segmentDedup(d, "doc_id", "text", segTokens = 2)
      .collect().head
    assert(r.getLong(1) == 3L && r.getLong(2) == 2L)
    assert(r.getString(3) == "x y z")
  }

  test("fuzzy neighbors: blocked edit distance, exact dups excluded") {
    import org.apache.spark.sql.functions.col
    val df = Seq(
      (1L, "kitten", "k"), (2L, "sitting", "k"),   // d=3, same block
      (3L, "kittens", "k"),                        // d(1,3)=1, d(2,3)=4
      (4L, "kitten", "k"),                         // exact dup of 1: d=0
      (5L, "kitten", "other"))                     // right name, wrong block
      .toDF("id", "nm", "blk")
    val out = Dedup.fuzzyNeighbors(df, "id", "nm", col("blk"), maxDist = 3)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getInt(3))).toMap
    // id 1: near = {2 (d3), 3 (d1)}; exact dup 4 (d0) excluded
    assert(out(1L) === ((2L, 3L, 1)))
    // id 2: near = {1 (d3), 3 (d3: s→k, i→e, g→s), 4 (d3)}; ties -> min id
    assert(out(2L) === ((3L, 1L, 3)))
    // id 5 matches nothing (different block) and emits no row
    assert(!out.contains(5L))
  }

  test("containment dedup finds near-subset pairs Jaccard would miss") {
    import org.apache.spark.sql.functions.col
    // doc 2 is doc 1 plus a long unique tail: containment(1->2) = 1.0,
    // Jaccard well under 0.5. doc 3 shares nothing rare with 1/2.
    val core = "alpha beta gamma delta epsilon zeta"
    val tail = (1 to 30).map(i => s"w$i").mkString(" ")
    val docs = Seq(
      (1L, core), (2L, s"$core $tail"),
      (3L, "omicron pi rho sigma tau upsilon"))
      .toDF("doc_id", "text")
    val out = Dedup.containmentDedup(docs, "doc_id", "text", k = 3,
        maxDf = 10, minContainPpm = 900000)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4),
          r.getLong(5), r.getLong(6))).toMap
    assert(out.keySet == Set((1L, 2L)))
    val (nA, nB, inter, contA, contB) = out((1L, 2L))
    // doc 1 has 4 distinct 3-shingles, all contained in doc 2
    assert(nA == 4L && inter == 4L && contA == 1000000L)
    assert(nB > nA && contB < 500000L) // Jaccard-style view misses it
    // the asymmetric metric must NOT fire for disjoint docs even at
    // threshold 0 beyond blocked candidates: doc 3 pairs with nobody
    assert(!out.keySet.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
