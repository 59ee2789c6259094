package graft

import org.apache.spark.sql.functions._
import graft.io.{Compaction, Profile}

class ProfileCompactionSpec extends SparkSpec {
  import spark.implicits._

  test("profile reports exact nulls, distincts and typed ranges") {
    val df = Seq(
      (Some(5L), Some("b")), (Some(3L), None), (None, Some("a")),
      (Some(5L), Some("c")), (Some(9L), Some("a")))
      .toDF("num", "s")
    val got = Profile.profile(df, Seq(
        ("num", col("num"), true), ("s", col("s"), false)))
      .collect().map(r => r.getString(0) -> r).toMap
    val n = got("num")
    assert(n.getLong(1) == 5L && n.getLong(2) == 1L && n.getLong(3) == 3L)
    assert(n.getLong(4) == 3L && n.getLong(5) == 9L)
    assert(n.isNullAt(6) && n.isNullAt(7))
    val s = got("s")
    assert(s.getLong(1) == 5L && s.getLong(2) == 1L && s.getLong(3) == 3L)
    assert(s.isNullAt(4) && s.isNullAt(5))
    assert(s.getString(6) == "a" && s.getString(7) == "c")
  }

  test("compaction plan cuts the running total at target boundaries " +
    "and preserves key order") {
    val segs = Seq(("a", 60L), ("b", 50L), ("c", 10L), ("d", 100L),
      ("e", 1L), ("f", 250L), ("g", 5L)).toDF("k", "b")
    val got = Compaction.plan(segs, "k", col("b"), targetBytes = 100L)
      .orderBy("k").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4)))
    // prefix-before: a=0,b=60,c=110,d=120,e=220,f=221,g=471
    val expect = Seq(
      ("a", 60L, 0L), ("b", 50L, 0L), ("c", 10L, 1L), ("d", 100L, 1L),
      ("e", 1L, 2L), ("f", 250L, 2L), ("g", 5L, 4L))
    got.zip(expect).foreach { case ((k, b, bt, _, _), (ek, eb, ebt)) =>
      assert(k == ek && b == eb && bt == ebt, s"$k: batch $bt vs $ebt")
    }
    // batch totals are consistent with membership
    val byBatch = got.groupBy(_._3)
    got.foreach { case (_, _, bt, bb, bs) =>
      assert(bb == byBatch(bt).map(_._2).sum && bs == byBatch(bt).size)
    }
    // consecutive keys share or increment batches (locality): batch ids
    // are non-decreasing in key order
    val bts = got.map(_._3)
    assert(bts.zip(bts.tail).forall { case (x, y) => y >= x })
  }

  test("snapshot diff classifies added/removed/changed/unchanged; " +
    "fingerprint is order-invariant and content-sensitive") {
    import graft.io.Snapshot
    val a = Seq((1L, "x", 10L), (2L, "y", 20L), (3L, "z", 30L))
      .toDF("k", "s", "v")
    val b = Seq((2L, "y", 20L), (3L, "z", 31L), (4L, "w", 40L))
      .toDF("k", "s", "v")
    val d = Snapshot.diff(a, b, "k", Seq("s", "v"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(d == Map("removed" -> 1L, "unchanged" -> 1L,
      "changed" -> 1L, "added" -> 1L))
    // fingerprint: permuting rows changes nothing; changing a value does
    val f1 = Snapshot.fingerprint(a, Seq("k", "s", "v")).head()
    val f2 = Snapshot.fingerprint(
      a.orderBy(org.apache.spark.sql.functions.col("v").desc),
      Seq("k", "s", "v")).head()
    assert(f1.getLong(0) == 3L &&
      f1.getLong(1) == f2.getLong(1))
    val f3 = Snapshot.fingerprint(b, Seq("k", "s", "v")).head()
    assert(f1.getLong(1) != f3.getLong(1))
  }
}
