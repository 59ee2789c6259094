package graft.llm

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Vocabulary construction and the hashing trick — the two standard
  * token -> feature-id paths in front of any text model.
  */
object Vocab {

  /** Top-K vocabulary with dense ids: id 1..K by (count desc, token),
    * plus the OOV row (id 0, "<unk>") carrying the residual token mass.
    *
    * Scale shape: token counting is the wordcount partial+final hash
    * aggregate; the top-K cut is TakeOrdered; the id window runs over
    * the ALREADY-LIMITED K-row frame (K-bounded by construction, not by
    * the data). The OOV mass needs the 1-row corpus total broadcast. */
  def buildVocab(toks: DataFrame, tokCol: String, topK: Int): DataFrame = {
    val counts = toks.groupBy(tokCol).agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col(tokCol)).limit(topK)
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col(tokCol))
    val vocab = top.withColumn("id", row_number().over(w).cast("long"))
    val total = toks.agg(count(lit(1)).as("__total"))
    val kept = vocab.agg(sum(col("n")).as("__kept"))
    val unk = total.crossJoin(kept)
      .select(lit(0L).as("id"), lit("<unk>").as(tokCol),
        (col("__total") - col("__kept")).as("n"))
    vocab.select(col("id"), col(tokCol), col("n")).unionByName(unk)
  }

  /** Hashing trick (feature hashing a la HashingVectorizer): token ->
    * bucket `key % dim` with a parity sign from the next hash bit, summed
    * per (doc, bucket) — fixed dimensionality with no vocabulary state,
    * the streaming-friendly alternative to [[buildVocab]]. Long-form
    * output (id, idx, val); cancelled buckets keep their 0 row. One scan,
    * partial+final hash aggregate on (id, idx). */
  def featureHash(docs: DataFrame, id: String, text: String,
                  dim: Int): DataFrame = {
    require(dim > 0, s"featureHash needs dim > 0, got $dim")
    require(dim <= (1 << 20),
      s"featureHash sign bit (bit 20) must be independent of idx: dim <= 2^20")
    val h = Sketch.tokenKey(col("__tok"))
    docs.select(col(id),
        explode(TextAnalysis.tokens(lower(col(text)))).as("__tok"))
      .select(col(id), pmod(h, lit(dim.toLong)).as("idx"),
        // sign from hash bit 20 — bit-shift, not division, so the
        // oracle's (h >> 20) & 1 is trivially identical
        when(shiftright(h, 20) % 2 === 0, 1L).otherwise(-1L).as("sign"))
      .groupBy(col(id), col("idx"))
      .agg(sum(col("sign")).as("val"))
  }
}
