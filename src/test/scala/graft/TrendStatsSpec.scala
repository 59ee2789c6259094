package graft

import org.apache.spark.sql.functions._
import graft.numerics.{Stats, Trend}
import graft.window.Changepoint

/** Round-15 verbs: Mann–Kendall/Sen, Pettitt, Benford, ACF/Ljung–Box,
  * Brown–Forsythe, Cliff's delta, tokenizer fertility — hand-computed
  * pins so the oracle queries cannot pass by symmetric mistakes. */
class TrendStatsSpec extends SparkSpec {
  import spark.implicits._

  test("mannKendallSen: monotone up/down pins S, z, doubled Sen slope") {
    val up = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L))
      .toDF("t", "v")
    val r = Trend.mannKendallSen(up, "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 5L)
    assert(r.getAs[Long]("n_pairs") === 10L)
    assert(r.getAs[Long]("s") === 10L)
    // z = (10-1)/sqrt(5*4*15/18) = 9/sqrt(16.666...) -> 2.204541
    assert(r.getAs[Double]("z") === 2.204541)
    // every pair slope is exactly 1/day -> doubled median 2e6
    assert(r.getAs[Long]("sen_slope_e6_x2") === 2000000L)
    val down = Seq((0L, 5L), (1L, 3L), (2L, 1L)).toDF("t", "v")
    val rd = Trend.mannKendallSen(down, "t", "v").collect()(0)
    assert(rd.getAs[Long]("s") === -3L)
    // z = (-3+1)/sqrt(3*2*11/18) -> -1.044466
    assert(rd.getAs[Double]("z") === -1.044466)
    // all slopes exactly -2/day, floor grid included
    assert(rd.getAs[Long]("sen_slope_e6_x2") === -4000000L)
  }

  test("mannKendallSen: all-tied series yields NULL z, not NaN") {
    // n = 4 >= 3 but every value tied: S = 0 and the tie term cancels
    // the variance exactly — the NULL-on-degenerate contract (a NaN
    // here would slip past downstream IS NULL checks)
    val flat = Seq((0L, 7L), (1L, 7L), (2L, 7L), (3L, 7L)).toDF("t", "v")
    val r = Trend.mannKendallSen(flat, "t", "v").collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("s") === 0L)
    assert(r.isNullAt(r.fieldIndex("z")))
    assert(r.getAs[Long]("sen_slope_e6_x2") === 0L)
  }

  test("pettitt: level shift pins U_t and the argmax bucket") {
    // [1,1,1,5,5,5]: r2(1)=4, r2(5)=10; U_t = 7t - sum r2 ->
    // 3,6,9,6,3,0 -> K=9 at bucket 3
    val s = Seq((1L, 1L), (2L, 1L), (3L, 1L), (4L, 5L), (5L, 5L),
      (6L, 5L)).toDF("b", "v")
    val r = Changepoint.pettitt(s, "b", "v")
      .orderBy("b").collect()
    assert(r.map(_.getAs[Long]("u_abs")).toSeq ===
      Seq(3L, 6L, 9L, 6L, 3L, 0L))
    assert(r.filter(_.getAs[Boolean]("is_changepoint"))
      .map(_.getAs[Long]("b")).toSeq === Seq(3L))
  }

  test("benford: hand case counts digits and excludes nonpositives") {
    val df = Seq(1L, 19L, 2L, 3L, 0L, -7L).toDF("v")
    val r = Stats.benford(df, col("v")).collect()(0)
    assert(r.getAs[Long]("n") === 4L)
    assert(r.getAs[Long]("n_excluded") === 2L)
    // chi2 from the pinned 8-dp expected grid, obs = [2,1,1,0,...],
    // n = 4: per-digit terms (o−4e)²/(4e) rounded at 8 dp sum to
    // 2.742627 (hand-computed on the same grid)
    assert(r.getAs[Double]("chi2") === 2.742627)
  }

  test("acfLjungBox: linear ramp pins exact rational lags") {
    val s = (0L to 9L).map(t => (t, t)).toDF("t", "v")
    val r = Trend.acfLjungBox(s, "t", "v", maxLag = 3)
      .orderBy("lag").collect()
    // dev_t = 10t - 45; den = 8250; num1 = 5775 -> 0.7 exactly;
    // num2 = 3400 -> 0.41212121
    assert(r(0).getAs[Long]("n_pairs") === 9L)
    assert(r(0).getAs[Double]("acf8") === 0.7)
    assert(r(1).getAs[Double]("acf8") === 0.41212121)
    assert(r(0).getAs[Double]("q") > 0.0)
    // constant series: zero variance -> NULL acf
    val const = (0L to 5L).map(t => (t, 7L)).toDF("t", "v")
    val rc = Trend.acfLjungBox(const, "t", "v", maxLag = 2).collect()
    assert(rc.forall(_.isNullAt(rc(0).fieldIndex("acf8"))))
  }

  test("brownForsythe: hand-computed F on median deviations") {
    // a: [1,1,5,5,3] -> med2 6, z = [4,4,4,4,0]; b: [2,4,2,4] ->
    // med2 6, z = [2,2,2,2]; anovaF -> F = 3.2/(12.8/7) = 1.75
    val df = (Seq.fill(2)(("a", 1L)) ++ Seq.fill(2)(("a", 5L)) :+
      ("a", 3L)) ++ Seq(("b", 2L), ("b", 4L), ("b", 2L), ("b", 4L))
    val r = Stats.brownForsythe(df.toDF("g", "v"), "g", "v").collect()(0)
    assert(r.getAs[Long]("n") === 9L)
    assert(r.getAs[Double]("f_stat") === 1.75)
  }

  test("cliffsDelta: full separation pins +-1e6, overlap pins 0") {
    val sep = Seq(("A", 3L), ("A", 4L), ("N", 1L), ("N", 2L))
      .toDF("g", "v")
    val r = Stats.cliffsDelta(sep, "g", "v", "A", "N").collect()(0)
    assert(r.getAs[Long]("delta_ppm") === 1000000L)
    val rev = Stats.cliffsDelta(sep, "g", "v", "N", "A").collect()(0)
    assert(rev.getAs[Long]("delta_ppm") === -1000000L)
    val tie = Seq(("A", 1L), ("N", 1L)).toDF("g", "v")
    val rt = Stats.cliffsDelta(tie, "g", "v", "A", "N").collect()(0)
    assert(rt.getAs[Long]("delta_ppm") === 0L)
  }

  test("tokenizerFertility: punct splits add tokens; ppm is floor-div") {
    val docs = Seq(("en", "hello, world"), ("en", "ok")).toDF("lang", "t")
    val r = graft.llm.TextAnalysis
      .tokenizerFertility(docs, "lang", "t").collect()(0)
    assert(r.getAs[Long]("ws_tokens") === 3L)
    assert(r.getAs[Long]("sub_tokens") === 4L)
    assert(r.getAs[Long]("fertility_ppm") === 1333333L)
  }

  test("kneserNeyPerplexity: hand-computed tiny-corpus pin") {
    // "a b a b": c12(a,b)=2 c12(b,a)=1, c1(a)=2 c1(b)=1, n1f=n1b=1
    // everywhere, 2 bigram types. P(b|a) = 1.25/2 + .75*(1/2)*(1/2)
    // = 0.8125; P(a|b) = .25 + .75*(1/2) = 0.625. avg of the 8-dp
    // -log2 terms over 3 bigrams -> 0.425731
    val docs = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val r = graft.llm.NgramLM.kneserNeyPerplexity(docs, "doc_id", "text")
      .collect()(0)
    assert(r.getAs[Long]("n_bigrams") === 3L)
    assert(r.getAs[Double]("avg_nll_kn") === 0.425731)
  }

  test("heapsFit: all-unique tokens pin beta exactly 1") {
    // every token globally unique -> V_k = N_k at every checkpoint ->
    // log-log points on the identity line -> slope 1, intercept 0
    val docs = (0L until 40L)
      .map(i => (i, s"u${i}_1 u${i}_2 u${i}_3")).toDF("doc_id", "text")
    val r = graft.llm.CorpusStats.heapsFit(docs, "doc_id", "text",
      nSlices = 8).collect()(0)
    assert(r.getAs[Long]("n_pts") === 8L)
    assert(r.getAs[Double]("beta") === 1.0)
    assert(r.getAs[Double]("log_k") === 0.0)
  }

  test("temperatureMix: hand-computed e4 weights and remainders") {
    // sources with 30 and 10 tokens, tau = 0.7, budget 100:
    // w = round(exp(.7*round(ln c, 8)), 4)*1e4 -> 108140 / 50119;
    // bases 68/31, the one shortfall goes to the larger remainder
    // (the 10-token source) -> allocs 68 and 32
    val docs = (Seq.fill(3)(("s30", 10L)) :+ ("s10", 10L))
      .toDF("src", "n")
    val r = graft.llm.Sampling.temperatureMix(docs, "src", col("n"),
      budget = 100L, tau = 0.7).orderBy(col("src"))
      .collect()
    assert(r.map(_.getAs[Long]("weight_e4")).toSeq ===
      Seq(50119L, 108140L))
    assert(r.map(_.getAs[Long]("alloc")).toSeq === Seq(32L, 68L))
    assert(r.map(_.getAs[Long]("alloc")).sum === 100L)
  }

  test("image dHash: planted families pair up through real PNG decode") {
    // two ten-doc families: every in-family pair (one-pixel
    // perturbations) within Hamming 6, no cross-family pair
    val ids = (0L until 20L).toDF("doc_id")
    val pngs = graft.llm.Multimodal.syntheticPngs(ids, "doc_id")
    val bands = graft.llm.Multimodal.dHashBands(pngs, "doc_id", "png")
    assert(bands.count() === 20L)
    val pairs = graft.llm.Multimodal.phashNearDupPairs(bands, "doc_id",
      maxHamming = 6).collect()
    assert(pairs.length === 2 * 45)
    assert(pairs.forall(r =>
      r.getAs[Long]("doc_a") / 10 === r.getAs[Long]("doc_b") / 10))
    assert(pairs.forall(_.getAs[Long]("hamming") <= 6L))
    // the f-mod-251 wrap makes families 0 and 251 byte-identical
    // images: exact dups at Hamming 0 — the verb must catch them
    val wrap = (0L until 3L).toDF("doc_id").unionByName(
      (2510L until 2513L).toDF("doc_id"))
    val wp = graft.llm.Multimodal.phashNearDupPairs(
      graft.llm.Multimodal.dHashBands(
        graft.llm.Multimodal.syntheticPngs(wrap, "doc_id"), "doc_id",
        "png"), "doc_id", maxHamming = 6).collect()
    assert(wp.exists(r => r.getAs[Long]("doc_a") === 0L &&
      r.getAs[Long]("doc_b") === 2510L &&
      r.getAs[Long]("hamming") === 0L))
  }

  test("spectralCentroid: monochromatic frames concentrate at their bin") {
    // 16-sample frames of cos(2*pi*2*n/16) scaled to +-1000: all
    // energy at bin 2 -> dominant_bin 2, centroid ~2 (e8-table
    // rounding leaks negligibly); a constant (DC) signal pins bin 0
    def wav(f: Int => Short): Array[Byte] = {
      val n = 32
      val bb = java.nio.ByteBuffer.allocate(44 + n * 2)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(36 + n * 2)
      bb.put("WAVE".getBytes); bb.put("fmt ".getBytes); bb.putInt(16)
      bb.putShort(1); bb.putShort(1); bb.putInt(16000); bb.putInt(32000)
      bb.putShort(2); bb.putShort(16)
      bb.put("data".getBytes); bb.putInt(n * 2)
      (0 until n).foreach(j => bb.putShort(f(j)))
      bb.array()
    }
    val tone = wav(j =>
      math.round(1000.0 * math.cos(2.0 * math.Pi * 2 * (j % 16) / 16))
        .toShort)
    val dc = wav(_ => 500.toShort)
    val df = Seq((1L, tone), (2L, dc)).toDF("doc_id", "media")
    val r = graft.llm.Multimodal.spectralCentroid(df, "doc_id", "media",
      frameLen = 16, maxFrames = 1).orderBy("doc_id").collect()
    assert(r(0).getAs[Long]("dominant_bin") === 2L)
    assert(math.abs(r(0).getAs[Double]("centroid6") - 2.0) < 0.1)
    assert(r(1).getAs[Long]("dominant_bin") === 0L)
    assert(r(1).getAs[Double]("centroid6") < 0.1)
  }

  test("round-15 verbs on empty input degrade per contract") {
    val e = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("t",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("v",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("g",
          org.apache.spark.sql.types.StringType))))
    val mk = Trend.mannKendallSen(e, "t", "v").collect()
    assert(mk.length === 1 && mk(0).getAs[Long]("n_pairs") === 0L &&
      mk(0).isNullAt(mk(0).fieldIndex("z")))
    assert(Changepoint.pettitt(e, "t", "v").count() === 0L)
    val bf = Stats.benford(e, col("v")).collect()
    assert(bf.length === 1 && bf(0).getAs[Long]("n") === 0L &&
      bf(0).isNullAt(bf(0).fieldIndex("chi2")))
    val acf = Trend.acfLjungBox(e, "t", "v", maxLag = 5).collect()
    assert(acf.length === 5 &&
      acf.forall(_.isNullAt(acf(0).fieldIndex("acf8"))))
    val cd = Stats.cliffsDelta(e, "g", "v", "A", "N").collect()
    assert(cd.length === 1 &&
      cd(0).isNullAt(cd(0).fieldIndex("delta_ppm")))
    assert(graft.llm.TextAnalysis.tokenizerFertility(
      e.select(col("g").as("lang"), col("g").as("text")),
      "lang", "text").count() === 0L)
    val ed = e.select(col("t").as("doc_id"), col("g").as("text"))
    assert(graft.llm.NgramLM.kneserNeyPerplexity(ed, "doc_id", "text")
      .count() === 0L)
    assert(graft.llm.LinkAnalysis.labelPropagation(
      e.select(col("t").as("x"), col("v").as("y")), "x", "y", 3)
      .count() === 0L)
    val eb = e.select(col("t").as("doc_id"),
      col("g").cast("binary").as("media"))
    assert(graft.llm.Multimodal.spectralCentroid(eb, "doc_id", "media",
      frameLen = 16, maxFrames = 2).count() === 0L)
    assert(graft.llm.Multimodal.phashNearDupPairs(
      graft.llm.Multimodal.dHashBands(
        eb.select(col("doc_id"), col("media").as("png")),
        "doc_id", "png"), "doc_id", 6).count() === 0L)
    val hf = graft.llm.CorpusStats.heapsFit(ed, "doc_id", "text")
      .collect()
    assert(hf.length === 1 && hf(0).getAs[Long]("n_pts") === 0L &&
      hf(0).isNullAt(hf(0).fieldIndex("beta")))
    assert(graft.llm.Sampling.temperatureMix(
      e.select(col("g").as("src"), col("v")), "src", col("v"), 100L)
      .count() === 0L)
  }
}
