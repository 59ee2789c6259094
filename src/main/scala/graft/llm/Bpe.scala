package graft.llm

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** BPE merge training (Sennrich et al. 2016, public arXiv:1508.07909) —
  * the vocabulary-construction step of a tokenizer pipeline, distributed.
  *
  * Classic structure: BPE never touches the raw corpus after one pass —
  * it runs on the WORD-FREQUENCY dictionary (distinct words with counts),
  * which is orders of magnitude smaller. Each round then is:
  *   1. count adjacent symbol pairs over the dictionary, weighted by word
  *      frequency — ONE hash-agg (the only shuffle per round);
  *   2. pick the most frequent pair (deterministic tie-break: lexicographic
  *      smallest) — a limit-1 TakeOrdered, 1 row to the driver (bounded
  *      state, the k-means-centroid pattern);
  *   3. apply the merge to every word's symbol string — a scan-stage
  *      literal replace on the bracket-delimited symbol form.
  * At 100 TB only step 0 (the word count) sees the corpus; the per-round
  * cost is proportional to the dictionary.
  *
  * Symbols travel as a bracket-delimited string "(b)(a)(n)": every
  * symbol is fully enclosed, so adjacent occurrences of a pair share NO
  * boundary characters and sequential left-to-right literal replacement
  * of "(l)(r)" with "(lr)" is EXACTLY Sennrich's greedy leftmost merge —
  * including adjacent repeats ("banana" + (a,n) -> b|an|an|a, which a
  * space-separated form gets wrong because the shared separator is
  * consumed by the previous match. Java's String.replace and DuckDB's
  * replace() scan identically, which is what lets the q207/q210 oracles
  * replay training round by round.
  */
object Bpe {

  /** Bracket-delimited symbol form of the word dictionary of `textCol`:
    * (w, s = "(c)(h)(a)(r)(s)", f = word frequency). Words restricted to
    * [a-z]+ so symbols never collide with the delimiters. */
  def symbolDict(docs: DataFrame, textCol: String): DataFrame =
    docs.select(explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
      .filter(col("w").rlike("^[a-z]+$"))
      .groupBy("w").agg(count(lit(1)).as("f"))
      .select(col("w"),
        concat(lit("("), array_join(split(col("w"), ""), ")("), lit(")"))
          .as("s"),
        col("f"))

  /** The symbol array of a bracket-delimited form: strip the outer
    * brackets, split on ")(". */
  private def symsArray(s: Column): Column =
    split(s.substr(lit(2), length(s) - 2), "\\)\\(")

  /** The training loop: returns (merge rows, final dictionary (w, s, f)
    * with all merges applied). */
  private def trainLoop(docs: DataFrame, textCol: String,
                        rounds: Int): (Seq[Row], DataFrame) = {
    var syms = graft.util.QueryCache.persist(symbolDict(docs, textCol))
    val merges = scala.collection.mutable.ArrayBuffer[Row]()
    var r = 1
    var exhausted = false
    while (r <= rounds && !exhausted) {
      val arr = syms.select(symsArray(col("s")).as("a"), col("f"))
      val pairs = arr
        .filter(size(col("a")) >= 2)
        .select(explode(transform(sequence(lit(1), size(col("a")) - 1),
          i => struct(element_at(col("a"), i).as("l"),
            element_at(col("a"), i + 1).as("r")))).as("p"), col("f"))
        .groupBy(col("p.l").as("l"), col("p.r").as("r"))
        .agg(sum("f").as("cnt"))
      val top = pairs.orderBy(col("cnt").desc, col("l"), col("r"))
        .limit(1).collect()
      if (top.isEmpty) exhausted = true
      else {
        val (l, rr, cnt) =
          (top.head.getString(0), top.head.getString(1), top.head.getLong(2))
        merges += Row(r, l, rr, cnt)
        syms = graft.util.QueryCache.persist(syms.select(col("w"),
          replace(col("s"), lit(s"($l)($rr)"), lit(s"($l$rr)")).as("s"),
          col("f")))
        r += 1
      }
    }
    (merges.toSeq, syms)
  }

  /** Train `rounds` BPE merges. Returns one row per merge:
    * (merge_rank, lhs, rhs, cnt) — the merge table a tokenizer ships. */
  def train(docs: DataFrame, textCol: String, rounds: Int): DataFrame = {
    val spark = docs.sparkSession
    val (merges, _) = trainLoop(docs, textCol, rounds)
    spark.createDataFrame(
      spark.sparkContext.parallelize(merges, 1),
      StructType(Seq(
        StructField("merge_rank", IntegerType, nullable = false),
        StructField("lhs", StringType, nullable = false),
        StructField("rhs", StringType, nullable = false),
        StructField("cnt", LongType, nullable = false))))
  }

  /** BPE ENCODING of the training dictionary: per word, the number of
    * symbols after all `rounds` merges (applying merges in rank order is
    * exactly the training replace chain, so the final training dictionary
    * IS the encoded form). Returns (w, n_sym) — broadcast-joinable onto
    * any token stream to get corpus-level BPE token counts. */
  def encodedCounts(docs: DataFrame, textCol: String,
                    rounds: Int): DataFrame = {
    val (_, dict) = trainLoop(docs, textCol, rounds)
    dict.select(col("w"),
      size(symsArray(col("s"))).cast("long").as("n_sym"))
  }
}
