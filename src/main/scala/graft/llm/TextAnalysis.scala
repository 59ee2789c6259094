package graft.llm

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * tokenization, quality scoring, language ID, fingerprinting. All pure
  * column expressions (codegen'd, no UDFs) — at 100 TB these run inside the
  * scan stage with zero shuffles.
  */
object TextAnalysis {

  /** Whitespace tokenizer (the BPE-ish regex variant splits punctuation). */
  def tokens(c: Column): Column = split(trim(c), "\\s+")
  def tokensBpeIsh(c: Column): Column =
    split(trim(regexp_replace(c, "([\\p{Punct}])", " $1 ")), "\\s+")

  def tokenCount(c: Column): Column = size(tokens(c))
  def distinctTokenCount(c: Column): Column = size(array_distinct(tokens(c)))

  /** type-token ratio — classic lexical-diversity quality signal. */
  def typeTokenRatio(c: Column): Column =
    distinctTokenCount(c).cast("double") / tokenCount(c)

  def digitRatio(c: Column): Column =
    length(regexp_replace(c, "[^0-9]", "")).cast("double") / length(c)
  def punctRatio(c: Column): Column =
    length(regexp_replace(c, "[^\\p{Punct}]", "")).cast("double") / length(c)
  def upperRatio(c: Column): Column =
    length(regexp_replace(c, "[^A-Z]", "")).cast("double") / length(c)
  def wsRatio(c: Column): Column =
    length(regexp_replace(c, "[^ ]", "")).cast("double") / length(c)
  def meanTokenLen(c: Column): Column =
    length(regexp_replace(c, "\\s+", "")).cast("double") / tokenCount(c)

  /** Stopword hit-rate against a small lexicon — the workhorse of
    * fastText-style quality filters. Lexicon is inlined into the regex, so
    * it broadcasts with the plan. */
  def stopwordRatio(c: Column, stopwords: Seq[String]): Column = {
    val pattern = "\\b(" + stopwords.mkString("|") + ")\\b"
    regexp_count(lower(c), lit(pattern)).cast("double") / tokenCount(c)
  }

  /** n-gram-heuristic language ID: score = stopword hits per language,
    * argmax wins (ties -> lexicographic language order for determinism).
    * A production system would use char n-gram profiles; the plumbing —
    * per-language scores + argmax in one projection — is identical. */
  def langId(c: Column, lexicons: Map[String, Seq[String]]): Column = {
    val scored = lexicons.toSeq.sortBy(_._1).map { case (lang, words) =>
      val pattern = "\\b(" + words.mkString("|") + ")\\b"
      struct(regexp_count(lower(c), lit(pattern)).as("score"), lit(lang).as("lang"))
    }
    // array_max on (score, lang) structs: max score, tie -> max lang;
    // reverse-sort languages inside equal scores is avoided by ordering the
    // struct fields (score first) and using the deterministic field order.
    array_max(array(scored: _*)).getField("lang")
  }

  /** Document fingerprint: md5 over the normalized sorted-token bag —
    * robust to token order, whitespace, and case (near-dup canonical key). */
  def fingerprint(c: Column): Column =
    md5(array_join(array_sort(array_distinct(tokens(lower(c)))), " "))

  /** Rolling (polynomial) hash over tokens, mod 2^61-1 — streaming-friendly
    * content hash; expression-only. */
  def rollingHash(c: Column): Column =
    // modulus 1e9+7 bounds acc so acc*31 + h stays far below 2^63
    // (ANSI-safe: Spark 4 throws on integral overflow)
    aggregate(
      transform(tokens(c), t => abs(xxhash64(t))),
      lit(0L),
      (acc, h) => pmod(acc * lit(31L) + pmod(h, lit(1000003L)), lit(1000000007L)))

  /** Winnowing fingerprints (Schleimer–Wilkerson–Aiken, the MOSS
    * algorithm): hash every k-char gram, slide a w-gram window, select
    * each window's minimum hash, dedupe selections per document. Any
    * match of length >= k+w-1 between two documents is guaranteed to
    * share a fingerprint, at ~2/(w+1) of the full gram density — the
    * SPARSE sibling of [[graft.llm.Dedup.duplicateSpans]]'s stride grid
    * (winnowing thins by local minima, a stride thins blindly).
    *
    * Portability: the gram hash is the 28-bit md5 prefix (the repo's
    * cross-engine hash convention), and the window selection key packs
    * (hash, position) into one BIGINT as h·2^24 + p, so a plain MIN
    * window aggregate picks the min-hash-then-LEFTMOST gram — one
    * deterministic tie rule shared with the SQL replay (MOSS picks
    * rightmost; any fixed rule preserves the winnowing guarantee).
    * Positions are bounded by the packing at 2^24 chars (~16 MB) per
    * document — far past any training document; longer ones would need
    * a wider shift, not a new algorithm.
    *
    * Scale shape: the heavy stage (explode + substring + md5) is a
    * per-doc projection before any exchange; the selection window is
    * doc-partitioned; the share join carries 28-bit hashes, never text.
    *
    * @return (doc_id, n_fps [distinct selected (hash,pos) grams],
    *         shared_fps [distinct selected hashes also selected by
    *         another doc]) */
  def winnow(docs: org.apache.spark.sql.DataFrame, id: String,
             text: String, k: Int, w: Int)
      : org.apache.spark.sql.DataFrame = {
    require(k >= 2 && w >= 2, s"winnow wants k >= 2, w >= 2; got $k, $w")
    val base = graft.util.Parallelize.ensure(docs)
      .select(col(id).as("doc_id"), col(text).as("t"))
      .filter(length(col("t")) >= k + w - 1)
    val keys = base
      .select(col("doc_id"), col("t"),
        explode(sequence(lit(0), length(col("t")) - k)).as("p"))
      .select(col("doc_id"), col("p"),
        (conv(substring(md5(expr(s"substring(t, p + 1, $k)")), 1, 7),
          16, 10).cast("long") * lit(16777216L) + col("p")).as("key"))
    val win = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("p"))
      .rowsBetween(0, w - 1)
    val fps = keys
      .withColumn("__cnt", count(lit(1)).over(win))
      .withColumn("__mk", min(col("key")).over(win))
      .filter(col("__cnt") === w)
      .select(col("doc_id"), col("__mk")).distinct()
    val perDoc = fps.groupBy("doc_id").agg(count(lit(1)).as("n_fps"))
    val docHash = fps
      .select(col("doc_id"), expr("__mk div 16777216").as("h")).distinct()
    val sharedH = docHash.groupBy("h")
      .agg(count(lit(1)).as("__df")).filter(col("__df") >= 2).select("h")
    val shared = docHash.join(sharedH, "h")
      .groupBy("doc_id").agg(count(lit(1)).as("shared_fps"))
    perDoc.join(shared, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_fps"),
        coalesce(col("shared_fps"), lit(0L)).as("shared_fps"))
  }

  // --- repetition signals (Gopher-rule family: "fraction of duplicate
  // word n-grams" quality filters) — expression-only, zero shuffle ---

  /** All word n-grams of a document as an array of joined strings. */
  def wordNgrams(c: Column, n: Int): Column = {
    val toks = tokens(c)
    // O(L) construction: n shifted slices zipped pairwise — NOT an O(L)
    // slice+join per gram (the HOF lambda is interpreted per element, so
    // the old transform(i -> array_join(slice(...))) was O(L²) per doc
    // and dominated corpus-wide n-gram queries). greatest(,0) keeps the
    // slice length legal for docs shorter than n (empty gram list).
    val m = greatest(size(toks) - (n - 1), lit(0))
    val shifted = (0 until n).map(i => slice(toks, lit(i + 1), m))
    shifted.reduceLeft((acc, s) =>
      zip_with(acc, s, (a, b) => concat_ws(" ", a, b)))
  }

  /** Fraction of n-grams that are duplicates of an earlier one
    * (0 = no repetition). NULL when the doc has fewer than n tokens. */
  def dupNgramRatio(c: Column, n: Int): Column = {
    val toks = tokens(c)
    val g = wordNgrams(c, n)
    when(size(toks) >= n,
      lit(1.0) - size(array_distinct(g)).cast("double") / size(g))
  }

  /** Gopher-style hard quality filter (Rae et al. 2021 appx. A: document
    * length bounds, mean-word-length window, stop-word floor, repetition
    * ceiling) as one struct of per-rule booleans — the downstream keep
    * decision is their conjunction, but keeping the flags lets a pipeline
    * report WHY a doc was dropped (rejection-reason histograms are a
    * standard curation artifact). Expression-only: runs in the scan. */
  def qualityFlags(c: Column, stopwords: Seq[String],
                   minTokens: Int, maxTokens: Int,
                   minMeanTokLen: Double, maxMeanTokLen: Double,
                   minStopwordRatio: Double,
                   maxDupNgramRatio: Double): Column = {
    val nt = tokenCount(c)
    struct(
      (nt >= minTokens && nt <= maxTokens).as("ok_len"),
      (meanTokenLen(c) >= minMeanTokLen &&
        meanTokenLen(c) <= maxMeanTokLen).as("ok_tok_len"),
      (stopwordRatio(c, stopwords) >= minStopwordRatio).as("ok_stopwords"),
      (coalesce(dupNgramRatio(c, 2), lit(0.0)) <= maxDupNgramRatio)
        .as("ok_repetition"))
  }

  // --- C4-style cleaning: boilerplate strippers as composable
  // regexp_replace passes (all RE2-compatible, so oracles mirror 1:1) ---

  def stripHtml(c: Column): Column = regexp_replace(c, "<[^>]+>", " ")
  def stripUrls(c: Column): Column =
    regexp_replace(c, "https?://[^ \\t\\n]+", " ")
  def stripEmails(c: Column): Column =
    regexp_replace(c, "[^ \\t\\n]+@[^ \\t\\n]+", " ")

  /** Full cleaning pipeline: html -> urls -> emails -> whitespace squeeze.
    * One fused projection in the scan stage. */
  def cleanText(c: Column): Column =
    trim(regexp_replace(stripEmails(stripUrls(stripHtml(c))), "\\s+", " "))

  // --- PII scrubbing (training-data hygiene): mask, don't drop — the
  // document survives with placeholder tokens. RE2-compatible patterns so
  // the DuckDB oracle replays them verbatim. ---

  val emailPat = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val ipv4Pat = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  val phonePat = "\\b\\d{3}[- ]\\d{3}[- ]\\d{4}\\b"

  /** Mask emails/IPv4s/phone numbers with placeholder tokens. IP runs
    * first so a dotted quad can't be half-eaten by the phone pattern. */
  def scrubPii(c: Column): Column =
    regexp_replace(
      regexp_replace(
        regexp_replace(c, ipv4Pat, "[IP]"),
        emailPat, "[EMAIL]"),
      phonePat, "[PHONE]")

  /** RAG-style document chunking: overlapping token windows of
    * `chunkTokens` tokens at stride `chunkTokens - overlap`, one row per
    * chunk with its index, token offset, and token count. The LAST chunk
    * is the one that first reaches the document end (no tail chunks fully
    * contained in an earlier one); docs at or under `chunkTokens` yield
    * one chunk. Pure scan-stage explode + slice — the canonical shape for
    * a 100 TB corpus → vector-store ingestion pass (chunks flow straight
    * into the embedding/ANN operators in [[Similarity]]). */
  def chunkDocuments(docs: org.apache.spark.sql.DataFrame, id: String,
                     text: String, chunkTokens: Int,
                     overlap: Int): org.apache.spark.sql.DataFrame = {
    require(overlap >= 0 && overlap < chunkTokens,
      s"overlap $overlap must be in [0, $chunkTokens)")
    val step = chunkTokens - overlap
    docs.select(col(id), tokens(col(text)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .withColumn("__d", col("__n") - chunkTokens + (step - 1))
      .withColumn("__last",
        when(col("__n") <= chunkTokens, lit(0))
          // exact integral floor-div (Column./ is double division)
          .otherwise(((col("__d") - pmod(col("__d"), lit(step))) / step)
            .cast("int")))
      .select(col(id), col("__toks"), col("__n"),
        explode(sequence(lit(0), col("__last"))).as("chunk_id"))
      .withColumn("tok_start", col("chunk_id") * step)
      .select(col(id), col("chunk_id"), col("tok_start"),
        least(lit(chunkTokens), col("__n") - col("tok_start")).as("n_toks"),
        array_join(slice(col("__toks"), col("tok_start") + 1,
          lit(chunkTokens)), " ").as("chunk_text"))
  }

  /** Per-document unigram Shannon entropy in bits — the classic
    * low-entropy-gibberish / keyword-stuffing quality signal (a CCNet/
    * Gopher-family statistic). H = log2(N) − (Σ c·log2 c)/N over the
    * whitespace token counts c. Wordcount-shaped: one shuffle on
    * (doc, word), one on doc — the same topology at 100 TB. Each libm
    * term is rounded to 8 dp then decimal-summed (the [[NgramLM]]
    * convention) so the fold is order-independent and oracle-exact. */
  def wordEntropy(docs: org.apache.spark.sql.DataFrame, id: String,
                  text: String): org.apache.spark.sql.DataFrame = {
    val counts = docs
      .select(col(id), explode(tokens(lower(col(text)))).as("w"))
      .groupBy(col(id), col("w")).agg(count(lit(1)).as("c"))
    // c·log2(c): exact integer when c is a power of two (no rounding-tie
    // risk at the 8-dp grid), irrational otherwise
    val term = round(col("c") * log2(col("c")), 8)
    counts.groupBy(col(id))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_types"),
        sum(term.cast(org.apache.spark.sql.types.DecimalType(30, 8)))
          .as("__slc"))
      .select(col(id), col("n_tokens"), col("n_types"), {
        // log2(N) pins to the 8-dp grid like every other libm term:
        // Spark's log2 is ln/ln2 while DuckDB's is native log2, and the
        // two differ in the last ulp for ~30% of integer inputs
        val h = round(log2(col("n_tokens")), 8) -
          col("__slc").cast("double") / col("n_tokens")
        // final 6-dp quantization via floor(x*1e6 + 0.5)/1e6, NOT
        // round(x, 6): the quotient is bit-identical on every engine
        // (same decimal sum, same IEEE division), but round()'s
        // HALF-WAY tie-break is not — Spark rounds the double's
        // shortest decimal repr, DuckDB the exact binary value, and at
        // sf0.1 ~0.1% of docs land on a 6-dp boundary (the generated
        // overflow gate's first catch). The floor form is pure IEEE
        // arithmetic both engines evaluate identically, so there is no
        // tie-break semantic left to disagree on.
        (floor(h * lit(1e6) + lit(0.5)) / lit(1e6)).as("entropy_bits")
      })
  }

  /** Per-slice n-gram diversity: distinct vs total word n-grams within
    * each `src` group — the self-repetition data-card metric (low
    * diversity ⇒ templated/boilerplate-heavy slice; the corpus-level
    * analog of Self-BLEU). Docs with fewer than `n` tokens are skipped
    * (no n-gram exists). Wordcount topology: explode → two aggs on the
    * (src, gram) key. Diversity reported in exact ppm. */
  def ngramDiversity(docs: org.apache.spark.sql.DataFrame, src: String,
                     text: String, n: Int): org.apache.spark.sql.DataFrame = {
    // no pre-filter: wordNgrams yields an EMPTY gram list for docs
    // shorter than n and explode drops them — a size(tokens(..)) filter
    // would re-tokenize every document in a second operator
    val grams = docs
      .select(col(src).as("src"),
        explode(wordNgrams(lower(col(text)), n)).as("g"))
    grams.groupBy(col("src"))
      .agg(count(lit(1)).as("n_grams"),
        countDistinct(col("g")).as("n_distinct"))
      .select(col("src"), col("n_grams"), col("n_distinct"),
        expr("n_distinct * 1000000 div n_grams").as("diversity_ppm"))
  }

  /** Gopher-style top-n-gram mass (Rae et al. 2021 appx. A: "fraction of
    * characters in the most frequent n-gram"): per doc, the modal word
    * n-gram (count desc, gram asc — deterministic ties) and the exact-ppm
    * share of the document's characters its occurrences cover
    * (`count · len(gram) / len(text)`, the standard non-overlapping
    * approximation, capped at 1e6 ppm — overlapping occurrences share
    * tokens, so the product can exceed the document). The ranking window
    * is per-doc (bounded by document length); the rest is scan-stage. */
  def topNgramMass(docs: org.apache.spark.sql.DataFrame, id: String,
                   text: String, n: Int): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // no pre-filter — empty gram lists explode to nothing (see
    // [[ngramDiversity]]); short docs drop for free
    val counts = docs
      .select(col(id), length(col(text)).as("n_chars"),
        explode(wordNgrams(lower(col(text)), n)).as("g"))
      .groupBy(col(id), col("n_chars"), col("g"))
      .agg(count(lit(1)).as("n_occ"))
    val w = Window.partitionBy(col(id))
      .orderBy(col("n_occ").desc, col("g"))
    counts.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .select(col(id), col("g").as("top_gram"), col("n_occ"),
        least(lit(1000000L),
          expr("n_occ * length(g) * 1000000 div n_chars")).as("mass_ppm"))
  }

  /** Pairwise vocabulary Jaccard between corpus slices (per `src` value):
    * |Va ∩ Vb| / |Va ∪ Vb| over distinct lowercased whitespace tokens —
    * the corpus-data-card "how much do my sources share a vocabulary"
    * diagnostic. Distinct (src, word) is wordcount-shaped; the pair join
    * runs on the VOCABULARY (not the corpus), keyed by word. */
  def vocabOverlap(docs: org.apache.spark.sql.DataFrame, src: String,
                   text: String): org.apache.spark.sql.DataFrame = {
    val vocab = graft.util.QueryCache.persist(
      docs.select(col(src).as("s"), explode(tokens(lower(col(text)))).as("w"))
        .distinct())
    val sizes = vocab.groupBy(col("s")).agg(count(lit(1)).as("n"))
    val inter = vocab.join(
        vocab.select(col("s").as("s2"), col("w")), Seq("w"))
      .filter(col("s") < col("s2"))
      .groupBy(col("s"), col("s2")).agg(count(lit(1)).as("n_inter"))
    inter
      .join(sizes.select(col("s"), col("n").as("n_a")), Seq("s"))
      .join(sizes.select(col("s").as("s2"), col("n").as("n_b")), Seq("s2"))
      .select(col("s").as("src_a"), col("s2").as("src_b"),
        col("n_a"), col("n_b"), col("n_inter"),
        // parts-per-million via exact integer floor division — a double
        // ratio rounded at fixed dp can land on engine-divergent ties
        expr("n_inter * 1000000 div (n_a + n_b - n_inter)")
          .as("jaccard_ppm"))
  }

  /** Tokenizer fertility per group (tokens-per-word): how many
    * sub-word-ish tokens the punct-splitting tokenizer emits per
    * whitespace word, by language — the standard multilingual-corpus
    * budgeting metric (a high-fertility language consumes more context
    * per sentence). The punctuation class is the EXPLICIT ASCII range
    * `[!-/:-@\[-`{-~]` — spelled out (not \p{Punct}) so any replaying
    * engine's regex sees the identical character set.
    *
    * One scan, per-group counts, exact ppm floor-div. Blank texts
    * (whitespace-only) still count 1 whitespace token (split yields
    * [""]) — the [[lengthBuckets]] caveat — and are reported via
    * n_docs so callers can pre-filter. */
  def tokenizerFertility(docs: org.apache.spark.sql.DataFrame,
                         group: String, text: String)
      : org.apache.spark.sql.DataFrame = {
    val punctSpaced = regexp_replace(col(text),
      "([!-/:-@\\[-`{-~])", " $1 ")
    val ws = size(split(trim(col(text)), "\\s+"))
    val bpe = size(split(trim(punctSpaced), "\\s+"))
    graft.util.Parallelize.ensure(docs)
      .select(col(group).as("grp"), ws.cast("long").as("w"),
        bpe.cast("long").as("t"))
      .groupBy(col("grp"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("w")).as("ws_tokens"),
        sum(col("t")).as("sub_tokens"))
      .select(col("grp"), col("n_docs"), col("ws_tokens"),
        col("sub_tokens"),
        expr("""CASE WHEN ws_tokens = 0 THEN NULL
                ELSE sub_tokens * 1000000 div ws_tokens END""")
          .as("fertility_ppm"))
  }
}
