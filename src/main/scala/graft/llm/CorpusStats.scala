package graft.llm

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-level composition statistics for training-data curation. */
object CorpusStats {

  /** Pairwise corpus overlap: exact Jaccard over the distinct word
    * k-shingle sets of every pair of sources — the "how much does web2
    * duplicate web1" diagnostic run before mixing weights are chosen.
    *
    * Scale shape: shingles travel as 64-bit hashed ids (the q51/q52
    * w.h.p.-exact convention — within-corpus collision ~1e-15, and the
    * oracle's string grams agree exactly at test scale), deduped to
    * (source, gram) in a partial+final hash aggregate; the pair join is
    * a gram-key equi-join whose per-gram co-occurrence list is bounded
    * by the number of SOURCES (not documents), so a gram contributes at
    * most S(S-1)/2 pair rows — no quadratic blow-up in corpus size.
    * `jaccard_ppm` is an exact integer (inter*1e6 div union, the
    * truncating integral division all engines share). Pairs with empty
    * intersection do not appear (nothing joins) — same on both engines.
    */
  def sourceOverlap(docs: DataFrame, source: String, text: String,
                    k: Int): DataFrame = {
    val grams = docs
      .select(col(source).as("src"),
        explode(Dedup.shingleIds(col(text), k)).as("g"))
      .distinct()
    val sz = grams.groupBy("src").agg(count(lit(1)).as("n"))
    val co = grams
      .join(grams.select(col("src").as("src_b"), col("g")), Seq("g"))
      .filter(col("src") < col("src_b"))
      .groupBy(col("src").as("src_a"), col("src_b"))
      .agg(count(lit(1)).as("inter"))
    co.join(sz.select(col("src").as("src_a"), col("n").as("na")), Seq("src_a"))
      .join(sz.select(col("src").as("src_b"), col("n").as("nb")), Seq("src_b"))
      .select(col("src_a"), col("src_b"), col("inter"),
        expr("inter * 1000000 div (na + nb - inter)").as("jaccard_ppm"))
  }
}
