package graft

import org.apache.spark.sql.functions._
import graft.agg.Robust
import graft.llm.Vocab

/** Robust statistics vs driver brute force (MAD, interquartile mean,
  * Tukey fences) and vocabulary/hashing-trick invariants. */
class RobustSpec extends SparkSpec {
  import spark.implicits._

  private val data = Seq(
    ("a", 1L), ("a", 2L), ("a", 3L), ("a", 4L), ("a", 100L), // outlier
    ("b", 10L), ("b", 12L), ("b", 14L), ("b", 16L))
  private def df = data.toDF("g", "v")

  private def q(xs: Seq[Long], p: Double): Double = { // Hyndman-Fan 7
    val s = xs.sorted.map(_.toDouble)
    val pos = p * (s.length - 1)
    val lo = pos.toInt
    if (lo == s.length - 1) s(lo)
    else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
  }

  test("mad equals the brute force") {
    val got = Robust.mad(df, "g", "v").orderBy("g").collect()
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { r =>
      val xs = byG(r.getString(0))
      val med = q(xs, 0.5)
      val mad = {
        val dev = xs.map(x => math.abs(x - med))
        val s = dev.sorted
        val pos = 0.5 * (s.length - 1); val lo = pos.toInt
        if (lo == s.length - 1) s(lo)
        else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
      }
      assert(r.getDouble(1) == med && r.getDouble(2) == mad,
        s"group ${r.getString(0)}")
    }
  }

  test("interquartile mean keeps exactly the [q1, q3] band") {
    val got = Robust.interquartileMean(df, "g", "v").orderBy("g").collect()
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { r =>
      val xs = byG(r.getString(0))
      val (q1, q3) = (q(xs, 0.25), q(xs, 0.75))
      val kept = xs.filter(x => x >= q1 && x <= q3)
      assert(r.getLong(1) == kept.length.toLong)
      val iqm = BigDecimal(kept.sum) / kept.length
      assert(math.abs(r.getDouble(2) - iqm.toDouble) < 1e-6)
    }
  }

  test("winsorized mean clamps to [q1, q3] and matches the brute force") {
    val got = Robust.winsorizedMean(df, "g", "v").orderBy("g").collect()
    val byG = data.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    got.foreach { r =>
      val xs = byG(r.getString(0))
      val (q1, q3) = (q(xs, 0.25), q(xs, 0.75))
      val clamped = xs.map(x => math.min(math.max(x.toDouble, q1), q3))
      assert(r.getLong(1) == xs.length.toLong)
      val wm = clamped.sum / xs.length
      assert(math.abs(r.getDouble(2) - wm) < 1e-6,
        s"group ${r.getString(0)}: ${r.getDouble(2)} vs $wm")
    }
    // the outlier is clamped, not dropped: winsorized mean of group a
    // sits strictly between the trimmed mean and the raw mean
    val a = got.find(_.getString(0) == "a").get.getDouble(2)
    val raw = byG("a").map(_.toDouble).sum / byG("a").size
    assert(a < raw && a > 2.0)
  }

  test("RFM segments: scores in 1..4, users partition, monetary exact") {
    import java.sql.Timestamp
    def ts(d: Int) = Timestamp.valueOf(f"2024-01-$d%02d 00:00:00")
    // 8 users with distinct recency/frequency/monetary profiles
    val ev = (1L to 8L).flatMap { u =>
      (1 to u.toInt).map(i =>
        (u, ts(u.toInt), if (i == 1) "purchase" else "view",
          u.toDouble * 10))
    }.toDF("user_id", "ts", "event_type", "value")
    val out = graft.window.Rfm.segments(ev, "user_id", "ts",
      "event_type", "value", "purchase").collect()
    assert(out.map(_.getAs[Long]("n_users")).sum == 8L)
    out.foreach { r =>
      val seg = r.getAs[String]("segment")
      assert(seg.length == 3 && seg.forall(c => c >= '1' && c <= '4'), seg)
    }
    // total monetary = sum of each user's one purchase (u * 10 dollars)
    assert(out.map(_.getAs[Long]("monetary_c")).sum ==
      (1L to 8L).map(_ * 1000L).sum)
  }

  test("tukey fences flag the planted outlier and only it") {
    val got = Robust.tukeyOutliers(df, "g", "v").collect()
      .map(r => r.getString(0) -> r).toMap
    assert(got("a").getAs[Long]("n_out") == 1L)
    assert(got("a").getAs[Long]("out_sum") == 100L)
    assert(got("b").getAs[Long]("n_out") == 0L)
    assert(got("b").getAs[Long]("out_sum") == 0L)
  }

  test("buildVocab: dense ids by (count desc, token), OOV mass exact") {
    val toks = (Seq.fill(5)("x") ++ Seq.fill(3)("y") ++ Seq.fill(3)("a") ++
      Seq("r1", "r2")).toDF("tok")
    val got = Vocab.buildVocab(toks, "tok", topK = 3)
      .orderBy("id").collect()
    assert(got.map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq((0L, "<unk>", 2L), (1L, "x", 5L), (2L, "a", 3L), (3L, "y", 3L)))
  }

  test("featureHash: values sum to the token count signed, buckets in range") {
    val docs = Seq((1L, "alpha beta gamma alpha"), (2L, "x")).toDF("doc_id", "text")
    val rows = Vocab.featureHash(docs, "doc_id", "text", dim = 8).collect()
    assert(rows.forall(r => r.getAs[Long]("idx") >= 0 &&
      r.getAs[Long]("idx") < 8))
    // |sum of vals| per doc <= token count, parity consistent: the same
    // token always contributes the same sign to the same bucket
    val again = Vocab.featureHash(docs, "doc_id", "text", dim = 8).collect()
    assert(rows.map(r => (r.getLong(0), r.getAs[Long]("idx"),
      r.getAs[Long]("val"))).sorted.toSeq ==
      again.map(r => (r.getLong(0), r.getAs[Long]("idx"),
        r.getAs[Long]("val"))).sorted.toSeq)
  }
}
