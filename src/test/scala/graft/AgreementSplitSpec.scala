package graft

import org.apache.spark.sql.functions._
import graft.llm.{Agreement, Splits, Vocab}

/** Krippendorff's alpha vs hand-computed values, group-holdout hygiene,
  * and the vocabulary coverage curve on a planted distribution. */
class AgreementSplitSpec extends SparkSpec {
  import spark.implicits._

  test("krippendorffAlpha: perfect agreement = 1e6 ppm; a planted " +
    "disagreement matches the hand-computed value") {
    val perfect = Seq((1L, "a", "a"), (2L, "b", "b"), (3L, "a", "a"))
      .toDF("i", "r1", "r2")
    val p = Agreement.krippendorffAlpha(perfect, col("i"),
      Seq(col("r1"), col("r2"))).head()
    assert(p.getAs[Long]("alpha_ppm") == 1000000L)

    // 4 items, 2 raters; item 4 disagrees (a vs b).
    // P_neq = 2 (ordered pairs), n = 8, marginals: a=5, b=3
    // S_neq = 64 - (25 + 9) = 30, m-1 = 1
    // alpha = 1 - (2*7*1e6) div 30 / 1e6 = 1e6 - 466666 = 533334
    val one = Seq((1L, "a", "a"), (2L, "a", "a"), (3L, "b", "b"),
      (4L, "a", "b")).toDF("i", "r1", "r2")
    val r = Agreement.krippendorffAlpha(one, col("i"),
      Seq(col("r1"), col("r2"))).head()
    assert(r.getAs[Long]("n_items") == 4L)
    assert(r.getAs[Long]("n") == 8L)
    assert(r.getAs[Long]("p_neq") == 2L)
    assert(r.getAs[Long]("alpha_ppm") == 1000000L - 2L * 7L * 1000000L / 30L)
  }

  test("krippendorffAlpha: all raters constant -> De = 0 -> NULL") {
    val const = Seq((1L, "a", "a"), (2L, "a", "a")).toDF("i", "r1", "r2")
    val r = Agreement.krippendorffAlpha(const, col("i"),
      Seq(col("r1"), col("r2"))).head()
    assert(r.isNullAt(r.fieldIndex("alpha_ppm")))
  }

  test("groupHoldout: no group straddles splits; counts partition rows") {
    val rows = (1L to 500L).flatMap(u => (1 to 3).map(i => (u, i)))
      .toDF("user_id", "x")
    val out = Splits.groupHoldout(rows, "user_id").collect()
    assert(out.forall(_.getAs[Long]("straddle_groups") == 0L))
    assert(out.map(_.getAs[Long]("n_rows")).sum == 1500L)
    assert(out.map(_.getAs[Long]("n_groups")).sum == 500L)
    // every user's 3 rows land in one split -> n_rows = 3 * n_groups
    out.foreach(r => assert(
      r.getAs[Long]("n_rows") == 3 * r.getAs[Long]("n_groups")))
  }

  test("coverageCurve: planted 8/4/2/1/1 masses give exact knee points") {
    // total 16; cum: 8, 12, 14, 15, 16
    val toks = (Seq.fill(8)("a") ++ Seq.fill(4)("b") ++ Seq.fill(2)("c") ++
      Seq("d", "e")).toDF("tok")
    val out = Vocab.coverageCurve(toks, "tok", topK = 5,
        targetsPct = Seq(50, 75, 90, 100))
      .orderBy("target_pct").collect()
      .map(r => (r.getInt(0), r.getAs[Long]("vocab_size"))).toSeq
    // 50% of 16 = 8 -> rank 1; 75% = 12 -> rank 2; 90% = 14.4 -> rank 3
    // covers 14 < 14.4 so rank 4 (cum 15, 15*100 >= 90*16=1440); 100% -> 5
    assert(out == Seq((50, 1L), (75, 2L), (90, 4L), (100, 5L)))
  }

  test("coverageCurve: unreachable target within topK emits no row") {
    val toks = (Seq.fill(5)("a") ++ Seq.fill(5)("b")).toDF("tok")
    val out = Vocab.coverageCurve(toks, "tok", topK = 1,
      targetsPct = Seq(40, 95)).collect()
    assert(out.length == 1 && out.head.getInt(0) == 40)
  }
}
