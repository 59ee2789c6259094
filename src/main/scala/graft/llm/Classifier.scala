package graft.llm

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** A fasttext-style linear quality classifier, TRAINED IN-ENGINE:
  * logistic regression over hashed bag-of-token features by full-batch
  * gradient descent. The standard "learned quality filter" of a curation
  * pipeline (labels come from any heuristic or human source; here the
  * caller supplies them as a column).
  *
  * Spark-first shape, like [[Cluster]]'s k-means and [[Bpe]]'s trainer:
  * the model is B+1 weights (a broadcast-sized table), one epoch is ONE
  * scan of the feature stream (margin join + per-bucket gradient agg),
  * and nothing corpus-sized ever reaches the driver. Determinism policy:
  * sigmoid outputs round to 8 dp, weights live at scale 12 where the
  * update g(8dp)·lr/N lands EXACTLY on the decimal grid whenever lr/N
  * has ≤4 decimal digits (the registered q219/q220 callers use lr=0.1,
  * N=500, i.e. lr/N = 2e-4) — values sit on grid points, never on
  * rounding boundaries, so
  * engines whose round() resolves true ties differently (shortest-repr
  * HALF_UP vs exact-binary) still agree; all sums accumulate in DECIMAL.
  * Every epoch is replayable bit-for-bit in SQL (epoch 1 is libm-free
  * outright: w0 = 0 makes every probability exactly 0.5).
  */
object Classifier {

  /** Per-doc hashed-unigram count features + a bias bucket (b = B):
    * (doc_id, b, x). Portable md5-prefix hash, like [[Dsir]]. */
  def features(docs: DataFrame, textCol: String, idCol: String,
               buckets: Int): DataFrame = {
    val toks = docs.select(col(idCol).as("doc_id"),
      explode(TextAnalysis.tokens(lower(col(textCol)))).as("w"))
    val counts = toks
      .select(col("doc_id"),
        pmod(conv(substring(md5(col("w")), 1, 4), 16, 10).cast("long"),
          lit(buckets.toLong)).as("b"))
      .groupBy("doc_id", "b").agg(count(lit(1)).as("x"))
    val bias = docs.select(col(idCol).as("doc_id"),
      lit(buckets.toLong).as("b"), lit(1L).as("x"))
    counts.unionByName(bias)
  }

  /** Train `epochs` full-batch GD steps and return ONLY the weight table
    * (b, w DECIMAL(18,12)) — the serveable model (broadcast it onto any
    * token stream; see q220's streaming scorer). */
  def trainWeights(docs: DataFrame, textCol: String, idCol: String,
                   label: Column, buckets: Int, epochs: Int,
                   lr: Double): DataFrame =
    trainLoop(docs, textCol, idCol, label, buckets, epochs, lr)._1

  /** Train `epochs` full-batch GD steps (learning rate `lr`) and score
    * every document. Returns (doc_id, prob, pred, y): the final-model
    * probability (rounded to 6 dp), the 0.5-threshold verdict, and the
    * training label. `label` must be a 0/1 integer column on `docs`. */
  def trainScore(docs: DataFrame, textCol: String, idCol: String,
                 label: Column, buckets: Int, epochs: Int,
                 lr: Double): DataFrame = {
    val (w, x, yd) =
      trainLoop(docs, textCol, idCol, label, buckets, epochs, lr)
    val finalMargin = x.join(broadcast(w), "b")
      .groupBy("doc_id")
      .agg(sum((col("w") * col("x").cast(DecimalType(10, 0)))
        .cast(DecimalType(38, 12))).as("m"))
    finalMargin.join(yd, "doc_id")
      .select(col("doc_id"),
        round(lit(1.0) / (lit(1.0) + exp(-col("m").cast("double"))), 6)
          .as("prob"),
        (col("m") >= 0).cast("int").as("pred"),
        col("y"))
  }

  private def trainLoop(docs: DataFrame, textCol: String, idCol: String,
                        label: Column, buckets: Int, epochs: Int,
                        lr: Double): (DataFrame, DataFrame, DataFrame) = {
    val spark = docs.sparkSession
    val x = graft.util.QueryCache.persist(
      features(docs, textCol, idCol, buckets))
    val yd = graft.util.QueryCache.persist(
      docs.select(col(idCol).as("doc_id"), label.cast("long").as("y")))
    val n = yd.count()
    // NARROW decimal types: a (28,12) x (20,0) product would exceed
    // precision 38 and Spark's allowPrecisionLoss silently REDUCES the
    // product scale to 6, quantizing gradients and margins. (18,12) x
    // (10,0) = precision 29 — exact at scale 12. |w|,|e| stay < 1e6.
    val dec = DecimalType(18, 12)
    val xDec = DecimalType(10, 0)
    // w: (b, w DECIMAL(18,12)); starts at zero for every bucket incl. bias
    var w: DataFrame = spark.range(0, buckets + 1)
      .select(col("id").as("b"), lit(0).cast(dec).as("w"))
    (1 to epochs).foreach { _ =>
      // margin per doc: decimal-exact Σ w_b·x_b (absent buckets add 0)
      val margin = x.join(broadcast(w), "b")
        .groupBy("doc_id")
        .agg(sum((col("w") * col("x").cast(xDec))
          .cast(DecimalType(38, 12))).as("m"))
      // p = round(sigmoid(margin), 8): the ONLY libm step per epoch
      val err = margin.join(yd, "doc_id")
        .select(col("doc_id"),
          (round(lit(1.0) / (lit(1.0) + exp(-col("m").cast("double"))), 8)
            .cast(dec) - col("y").cast(dec)).as("e"))
      // per-bucket gradient: decimal-exact Σ err_d·x_db
      val grad = x.join(err, "doc_id")
        .groupBy("b")
        .agg(sum((col("e") * col("x").cast(xDec))
          .cast(DecimalType(38, 8))).as("g"))
      // w' = w − round(lr·g/N, 12): the update value is exactly 12 dp
      // (8-dp gradient x 2e-4), so the round is grid-exact, never a tie
      val wNext = w.join(grad, Seq("b"), "left")
        .select(col("b"),
          (col("w") - coalesce(
            round(col("g").cast("double") * lr / n, 12).cast(dec),
            lit(0).cast(dec))).cast(dec).as("w"))
      // cache the epoch's weights (B+1 rows): left uncached the weight
      // plan NESTS per epoch, and every broadcast of epoch t re-executes
      // epochs 1..t-1's margin/gradient passes — the final scoring pass
      // then re-executes the whole loop once more (measured: the 4
      // registered trainScore eval callers each spent ~40 driver jobs
      // re-running epoch subtrees at sf0.1). Measured trade, accepted
      // (BASELINE.md round-17 q219 re-record): the InMemoryRelation is
      // substituted BEFORE optimizer pruning, so a consumer that never
      // needs the weight values (q219's count-shaped bench action, which
      // used to prune the whole training chain) now pays the real fit —
      // 1.31 s (never trained) -> 2.33 s — while the five eval verbs
      // that DO consume the weights each save the 1.14-1.53x chain
      // re-execution. LAZY persist, not collect: an eager collect was
      // measured worse still for q219 (3.13 s).
      w = graft.util.QueryCache.persist(wNext)
    }
    (w, x, yd)
  }
}
