package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Sparse + hybrid retrieval over a document corpus — the query-side
  * counterpart of the dedup/ANN family: BM25 term scoring and
  * reciprocal-rank fusion of heterogeneous rankings.
  *
  * Scale shape: tokenization is one explode over the corpus scan; per-term
  * document frequencies for a literal query are a broadcast-sized aggregate
  * (|terms| rows); the per-document score is one hash aggregation keyed on
  * doc id. Nothing shuffles more than once and no ranking window is wider
  * than the score-carrying subset of the corpus.
  *
  * Determinism policy (the repo-wide one): the only libm value (idf's ln)
  * is rounded to 8 dp at birth; per-term contributions are combined as a
  * FIXED-ORDER column sum (conditional-agg pivot, not a float groupBy sum);
  * final scores round to 6 dp before ranking on both engines.
  */
object Retrieval {

  /** Okapi BM25 (Robertson et al., the `(k1, b)` variant with the
    * `ln(1 + (N - df + 0.5)/(df + 0.5))` idf) of a literal query-term set
    * against a whitespace-tokenized corpus. Documents containing none of
    * the query terms score nothing and drop out of the ranking — the
    * standard sparse-retrieval contract. Returns the top `k` documents as
    * (id, rk, score). */
  def bm25TopK(corpus: DataFrame, id: String, text: String,
               terms: Seq[String], k: Int,
               k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(terms.nonEmpty && terms == terms.distinct, "literal query terms must be distinct")
    val tokd = graft.util.QueryCache.persist(corpus
      .select(col(id), explode(TextAnalysis.tokens(lower(col(text)))).as("term")))
    val docLen = tokd.groupBy(col(id)).agg(count(lit(1)).as("dl"))
    // corpus stats: N and avgdl — ONE row, broadcast onto the scoring join
    val stats = docLen.agg(count(lit(1)).as("n"), sum(col("dl")).as("tot"))
      .select(col("n"), (col("tot").cast("double") / col("n")).as("avgdl"))
    // tf over the query terms only (the isin predicate reaches the token
    // stream before the aggregation); df derived from tf — no extra
    // distinct pass over the corpus
    val tf = tokd.filter(col("term").isin(terms: _*))
      .groupBy(col(id), col("term")).agg(count(lit(1)).as("tf"))
    val df = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val contrib = tf.join(broadcast(df), "term").join(docLen, Seq(id))
      .crossJoin(broadcast(stats))
      .withColumn("idf", round(
        log((col("n").cast("double") - col("df") + lit(0.5)) /
          (col("df") + lit(0.5)) + lit(1.0)), 8))
      .withColumn("c",
        (col("idf") * (col("tf") * lit(k1 + 1.0))) /
          (col("tf") + lit(k1) *
            (lit(1.0) - lit(b) + lit(b) * (col("dl") / col("avgdl")))))
    // fixed-order combine: one conditional-agg column per literal term,
    // added left-to-right (a float SUM over an unordered group would not
    // be reproducible across engines)
    val perTerm = contrib.groupBy(col(id)).agg(
      max(when(col("term") === terms.head, col("c"))).as("__t0"),
      terms.tail.zipWithIndex.map { case (t, i) =>
        max(when(col("term") === t, col("c"))).as(s"__t${i + 1}")
      }: _*)
    val score = terms.indices
      .map(i => coalesce(col(s"__t$i"), lit(0.0)))
      .reduceLeft(_ + _)
    // global top-k via TakeOrdered (orderBy+limit), NOT a global window —
    // the rank ordinal attaches afterwards over the k surviving rows only
    val top = perTerm.withColumn("score", round(score, 6))
      .orderBy(col("score").desc, col(id)).limit(k)
    val w = Window.orderBy(col("score").desc, col(id))
    top.withColumn("rk", row_number().over(w))
      .select(col(id), col("rk"), col("score"))
  }

  /** Reciprocal-rank fusion (Cormack & Clarke 2009): combine two rankings
    * of the same id space into `sum(1 / (c + rank))` with the standard
    * c = 60. Ranks are integers and the two addends combine in a fixed
    * order, so the fused score is exact IEEE arithmetic — no rounding
    * needed. Ids present in only one list contribute that list's term
    * alone (full-outer semantics, the usual hybrid-retrieval contract). */
  def rrfFuse(a: DataFrame, b: DataFrame, id: String, rank: String,
              k: Int, c: Int = 60): DataFrame = {
    val left = a.select(col(id), col(rank).as("__ra"))
    val right = b.select(col(id), col(rank).as("__rb"))
    val fused = left.join(right, Seq(id), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(c.toDouble) + col("__ra")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(c.toDouble) + col("__rb")), lit(0.0)))
    // both inputs are already-limited rank lists, so the fused frame is
    // bounded by their combined length; TakeOrdered + a k-row ordinal
    val top = fused.orderBy(col("rrf").desc, col(id)).limit(k)
    val w = Window.orderBy(col("rrf").desc, col(id))
    top.withColumn("rk", row_number().over(w))
      .select(col(id), col("rk"), col("rrf"))
  }
}
