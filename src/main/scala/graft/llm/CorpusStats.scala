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
  /** Zipf power-law fit over the top-K vocabulary: the corpus-health
    * diagnostic (natural text fits slope ≈ −1; template/boilerplate
    * corpora flatten it). Least squares of y = round(ln n, 8) on
    * x = round(ln rank, 8): the rounded points ride the 8-dp decimal
    * grid so every power sum is exact and order-free; slope and
    * intercept are ONE fixed IEEE expression each over the single
    * aggregate row (the q40 correlation convention). The only window
    * attaches ranks to the K-row TakeOrdered result. */
  def zipfFit(docs: DataFrame, text: String, topK: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.types.DecimalType
    val counts = docs
      .select(explode(graft.llm.TextAnalysis.tokens(
        trim(lower(col(text))))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy("tok").agg(count(lit(1)).as("n"))
    val top = counts.orderBy(col("n").desc, col("tok")).limit(topK)
    val w = Window.orderBy(col("n").desc, col("tok"))
    val pts = top.withColumn("rank", row_number().over(w))
      .select(
        round(log(col("rank").cast("double")), 8)
          .cast(DecimalType(18, 8)).as("x"),
        round(log(col("n").cast("double")), 8)
          .cast(DecimalType(18, 8)).as("y"))
    val agg = pts.agg(count(lit(1)).as("np"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x") * col("y")).cast(DecimalType(38, 16))).as("sxy"),
      sum((col("x") * col("x")).cast(DecimalType(38, 16))).as("sxx"))
    agg.select(col("np").as("n_pts"),
      (round(expr(
        """(CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
           / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))"""), 6)
        + lit(0.0)).as("slope"),
      (round(expr(
        """(CAST(sy AS DOUBLE)
            - (CAST(np AS DOUBLE) * CAST(sxy AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
              / (CAST(np AS DOUBLE) * CAST(sxx AS DOUBLE)
                - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
              * CAST(sx AS DOUBLE)) / CAST(np AS DOUBLE)"""), 6)
        + lit(0.0)).as("intercept"))
  }

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
