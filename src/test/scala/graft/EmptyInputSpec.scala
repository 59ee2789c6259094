package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.model.XDataset

/** Degenerate shapes: every core operator must return EMPTY (not throw) on
  * an empty dataset — the reference's behavior on zero-length dims. */
class EmptyInputSpec extends SparkSpec {
  import spark.implicits._

  private val empty = XDataset(
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType), StructField("t", DoubleType),
        StructField("v", DoubleType)))),
    dims = Seq("k", "t"))

  test("selection / masking / reductions on empty input") {
    assert(empty.sel("k", Seq(1L)).df.count() === 0L)
    assert(empty.selSlice("t", 0.0, 10.0).df.count() === 0L)
    assert(empty.whereMask(col("v") > 0).df.count() === 0L)
    assert(empty.dropna().df.count() === 0L)
    assert(empty.fillna(0.0).df.count() === 0L)
    val agg = empty.reduce(Seq("t"), Seq(sum(col("v")).as("s")))
    assert(agg.count() === 0L) // no groups -> no rows
  }

  test("windows / interp / dedup on empty input") {
    val w = graft.window.Windows.rolling(Seq(col("k")), Seq(col("t")), 3)
    assert(empty.df.withColumn("m", avg(col("v")).over(w)).count() === 0L)
    val probes = Seq((1L, 5.0)).toDF("k", "t")
    val interp = graft.numerics.Numerics.interpLinear(
      empty.df, probes, by = Seq("k"), t = "t", v = "v")
    // probes with no observations -> NULL interp, not an error
    assert(interp.count() === 1L)
    assert(interp.filter(col("v_interp").isNotNull).count() === 0L)
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(graft.llm.Dedup.exact(docs, "doc_id", "text").count() === 0L)
  }

  test("single-row input: rolling/pad/rank degenerate gracefully") {
    val one = Seq((1L, 0L, 2.5)).toDF("k", "pos", "v")
    val padded = graft.window.Pad.pad(one, "pos", "v", n = 1,
      before = 1, after = 1, constant = 0.0)
    assert(padded.count() === 3L)
    val ranked = graft.agg.Rank.avgRank(one.select("v"), "v", "r")
    assert(ranked.head().getDouble(1) === 1.0)
  }

  test("packing prefix sum: empty, single-row, and sparse-id inputs") {
    import graft.llm.Packing
    val emptyDocs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType), StructField("n", LongType))))
    // empty: probe stats are null -> falls to the range path -> empty out
    assert(Packing.globalRunningSum(emptyDocs, col("id"), col("n"), "s")
      .count() === 0L)
    // single row (dense by definition): fast path, sum = own value
    val oneRow = Seq((7L, 5L)).toDF("id", "n")
    assert(Packing.globalRunningSum(oneRow, col("id"), col("n"), "s")
      .select("s").head().getLong(0) === 5L)
    // sparse ids (holes) must NOT take the dense path silently wrong:
    // running sums still correct via the fallback
    val sparse = Seq((1L, 1L), (5L, 2L), (100L, 3L)).toDF("id", "n")
    val got = Packing.globalRunningSum(sparse, col("id"), col("n"), "s")
      .orderBy("id").select("s").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L, 3L, 6L))
  }

  test("semDedup with iters=0 (no Lloyd stats) falls back safely") {
    import graft.llm.Dedup
    val vecs = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(2.0, 0.0)), (3L, Array(0.0, 1.0)))
      .toDF("id", "vec")
    // iters=0 -> stats stay (0, 0) -> shuffle-join path; planted exact
    // duplicate direction (2,0) ~ (1,0) must still be pruned
    val pruned = Dedup.semDedup(vecs, "id", "vec", k = 1, iters = 0,
      threshold = 0.99)
    assert(pruned.select("id").collect().map(_.getLong(0)).toSet
      .contains(2L))
  }

  test("retrieval verbs degenerate to empty, not errors") {
    import graft.llm.{Retrieval, Similarity, Dedup}
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    // empty corpus -> empty ranking (stats aggregate yields no rows to join)
    assert(Retrieval.bm25TopK(docs, "doc_id", "text",
      Seq("nothing"), k = 5).count() === 0L)
    // terms absent from a NON-empty corpus -> every doc drops out
    val d2 = Seq((1L, "alpha beta"), (2L, "gamma")).toDF("doc_id", "text")
    assert(Retrieval.bm25TopK(d2, "doc_id", "text",
      Seq("zzz"), k = 5).count() === 0L)
    // fusion with one empty side keeps the other's contributions
    val a = Seq((1L, 1)).toDF("id", "rk")
    val none = a.filter(col("rk") < 0)
    assert(Retrieval.rrfFuse(a, none, "id", "rk", k = 5).count() === 1L)
    assert(Retrieval.rrfFuse(none, none, "id", "rk", k = 5).count() === 0L)
    // MMR / segment dedup / hard negatives on empty inputs
    val cands = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("probe_id", LongType),
        StructField("vec_id", LongType), StructField("rel", DoubleType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Retrieval.mmrRerank(cands, "probe_id", "vec_id", "rel",
      "embedding", lambda = 0.5, k = 3).count() === 0L)
    assert(Dedup.segmentDedup(docs, "doc_id", "text", 4).count() === 0L)
    val vecs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))
    assert(Similarity.hardNegatives(vecs,
      vecs.select(col("vec_id").as("probe_id"), col("embedding")),
      "vec_id", "probe_id", "embedding", k = 3, dupCeil = 0.9)
      .count() === 0L)
  }

  test("round-12 fourth-pass verbs return empty (or contract) on empty input") {
    import graft.llm.{Cluster, LinkAnalysis, Packing, Retrieval, Sampling,
      TextAnalysis}
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType), StructField("src", StringType))))
    assert(TextAnalysis.wordEntropy(docs, "doc_id", "text").count() === 0L)
    assert(TextAnalysis.vocabOverlap(docs, "src", "text").count() === 0L)
    assert(TextAnalysis.ngramDiversity(docs, "src", "text", 2).count() === 0L)
    assert(TextAnalysis.topNgramMass(docs, "doc_id", "text", 2).count() === 0L)
    assert(Packing.lengthBuckets(docs, "doc_id", lit(0L), 8).count() === 0L)
    assert(Retrieval.queryLikelihoodTopK(docs, "doc_id", "text",
      Seq("spark"), k = 5).count() === 0L)
    assert(Sampling.weightedSample(docs, "doc_id", lit(1.0), 5)
      .count() === 0L)
    val assigned = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType),
        StructField("cluster", IntegerType), StructField("d2", DoubleType))))
    assert(Cluster.balancedDownsample(assigned, "id").count() === 0L)
    val events = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("u", LongType),
        StructField("ts", TimestampType), StructField("et", StringType),
        StructField("eid", LongType))))
    assert(graft.window.Funnel.ordered(events, "u", "ts", "et",
      Seq("view", "click")).count() === 0L)
    assert(graft.window.Sessions.stats(events, "u", "ts", 60).count() === 0L)
    assert(graft.window.Cohort.weeklyRetention(events, "u", "ts", "et",
      "signup").count() === 0L)
    assert(graft.window.Markov.transitions(events, "u", "ts", "et",
      col("eid")).count() === 0L)
    assert(graft.numerics.Holt.smooth(events, "u", "ts", "eid", lit(0L))
      .count() === 0L)
    val nodes = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("id", LongType))))
    val edges = nodes.select(col("id").as("s"), col("id").as("d"))
    // pagerank REQUIRES a non-empty universe (documented contract)
    intercept[IllegalArgumentException] {
      LinkAnalysis.pagerank(nodes, edges, "id", "s", "d", 1)
    }
    assert(LinkAnalysis.alsoTook(
      nodes.select(col("id").as("b"), col("id").as("i")), "b", "i", 3)
      .count() === 0L)
  }

  test("round-13 third-pass verbs return empty (not throw) on empty input") {
    import graft.llm.{CorpusStats, Sketch, Url}
    val toks = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("src", StringType),
        StructField("tok", StringType))))
    assert(Sketch.kmvPairs(toks, "src", "tok", 8).count() === 0L)
    val vals = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("v", LongType))))
    assert(Sketch.histogramQuantile(vals, "v", 100L, Seq(50))
      .count() === 0L)
    val docs = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("text", StringType))))
    // zipf on empty: one aggregate row with np = 0; slope/intercept null
    val zf = CorpusStats.zipfFit(docs, "text", 10).collect()
    assert(zf.length === 1 && zf.head.getLong(0) === 0L &&
      zf.head.isNullAt(1))
    val snap = Seq((1L, 10L)).toDF("k", "v")
    val chg = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("k", LongType),
        StructField("seq", IntegerType), StructField("op", StringType),
        StructField("v", LongType))))
    assert(graft.align.ChangelogMerge.scd2History(chg, "k", "seq", "op")
      .count() === 0L)
    val conv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("u", LongType),
        StructField("t", TimestampType), StructField("cid", LongType),
        StructField("vc", LongType))))
    val tch = conv.select(col("u"), col("t"), lit("x").as("tt"))
    assert(graft.align.Attribution.linearTouch(conv, tch, "u", "t",
      "cid", "vc", "tt", 1000000L, 1000000L).count() === 0L)
    assert(Seq.empty[String].toDF("url")
      .select(Url.canonicalize(col("url"))).count() === 0L)
  }

  test("round-13 late additions on empty input") {
    val empt = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("g", StringType),
        StructField("v", LongType), StructField("s", BooleanType))))
    // survival: no subjects -> no duration rows
    assert(graft.numerics.Survival.kaplanMeier(
      empt.select(col("v").as("dur"), lit(1).as("ev")), "dur", "ev")
      .count() === 0L)
    // stats batteries: no groups -> no rows
    assert(graft.numerics.Stats.twoPropZBattery(empt, "g", col("s"))
      .count() === 0L)
    assert(graft.numerics.Stats.wilsonInterval(empt, "g", col("s"))
      .count() === 0L)
    assert(graft.numerics.Stats.benjaminiHochberg(
      empt.select(col("g").as("id"),
        col("v").cast("decimal(18,8)").as("p")),
      "id", "p", 1, 20).count() === 0L)
    // bootstrap: empty input -> empty CI frame (no replicate rows)
    assert(graft.numerics.Bootstrap.meanCI(empt, col("g"), col("v"))
      .count() === 0L)
    // calibration / isotonic: empty scored frame -> empty reports
    val scored0 = empt.select(col("v").as("y"),
      col("v").cast("double").as("prob"))
    assert(graft.llm.Calibration.eceReport(scored0).count() === 0L)
    assert(graft.llm.Calibration.isotonicFit(
      empt.select(col("v").as("bucket"), col("v").as("n"),
        col("v").as("k"))).count() === 0L)
    // profiling: zero rows still produces one row per spec (n_rows 0)
    val prof = graft.io.Profile.profile(empt, Seq(("v", col("v"), true)))
      .collect()
    assert(prof.length === 1 && prof.head.getLong(1) === 0L)
    // compaction / markov / concurrency / trees / snapshot
    assert(graft.io.Compaction.plan(
      empt.select(col("g").as("k"), col("v").as("b")), "k", col("b"),
      1000L).count() === 0L)
    val ev0 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("u", LongType),
        StructField("t", TimestampType), StructField("et", StringType),
        StructField("eid", LongType))))
    assert(graft.window.Markov.removalAttribution(ev0, "u", "t", "et",
      col("eid")).count() === 0L)
    assert(graft.window.Concurrency.dailyPeak(
      ev0.select(col("t").as("t_start"), col("t").as("t_end")),
      "t_start", "t_end").count() === 0L)
    assert(graft.llm.Trees.trainStump(empt, col("s"),
      Seq(("v", col("v")))).count() === 0L)
    assert(graft.io.Snapshot.diff(empt, empt, "g", Seq("v"))
      .count() === 0L)
    val fp = graft.io.Snapshot.fingerprint(empt, Seq("g", "v")).head()
    assert(fp.getLong(0) === 0L && fp.isNullAt(1))
    // holt-winters: series shorter than m -> no rows
    assert(graft.numerics.Holt.holtWinters(
      empt.select(col("v").as("e"), col("v").as("t"),
        col("v").as("y")), "e", "t", col("y"), m = 7).count() === 0L)
    // rake / containment / link prediction on empty docs
    val docs0 = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("doc_id", LongType),
        StructField("text", StringType))))
    assert(graft.llm.CorpusStats.rakeKeywords(docs0, "doc_id", "text",
      Seq("the"), 3, 10).count() === 0L)
    assert(graft.llm.Dedup.containmentDedup(docs0, "doc_id", "text", 3,
      10L, 500000L).count() === 0L)
    assert(graft.llm.LinkAnalysis.linkPrediction(
      empt.select(col("v").as("b"), col("v").as("i")), "b", "i", 60L,
      10).count() === 0L)
  }

  test("zorder: empty input writes an empty store; constant key is safe") {
    import graft.io.ZOrder
    val emptyEv = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(StructField("a", LongType), StructField("b", LongType))))
    ZOrder.write(emptyEv, "/tmp/graft_zorder_empty", Seq("a", "b"), 2)
    assert(spark.read.parquet("/tmp/graft_zorder_empty").count() === 0L)
    // zero span (constant key) must not divide by zero
    val const = Seq((1L, 1L), (1L, 2L), (1L, 3L)).toDF("a", "b")
    ZOrder.write(const, "/tmp/graft_zorder_const", Seq("a", "b"), 2)
    assert(spark.read.parquet("/tmp/graft_zorder_const").count() === 3L)
  }
}
