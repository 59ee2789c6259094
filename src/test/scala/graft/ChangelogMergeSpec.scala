package graft

import org.apache.spark.sql.functions._
import graft.align.ChangelogMerge

/** MERGE semantics vs a driver-side model: last-writer-wins per key,
  * delete wins/loses by version, insert of new keys, untouched
  * passthrough, and the deterministic full-record tiebreak on version
  * ties. */
class ChangelogMergeSpec extends SparkSpec {
  import spark.implicits._

  private val snap = Seq(
    (1L, "a", 100L), (2L, "b", 200L), (3L, "c", 300L), (4L, "d", 400L))
    .toDF("k", "s", "v")

  test("last writer wins; deletes remove; inserts create; untouched " +
    "keys pass through") {
    val chg = Seq(
      // key 1: update then delete (delete is latest -> gone)
      (1L, 1, "U", "a1", 110L), (1L, 2, "D", "a2", 0L),
      // key 2: delete then update (update is latest -> survives updated)
      (2L, 1, "D", "x", 0L), (2L, 2, "U", "b2", 220L),
      // key 3: two updates -> latest version
      (3L, 1, "U", "c1", 310L), (3L, 5, "U", "c5", 350L),
      // key 9: insert of a new key
      (9L, 1, "I", "i", 900L),
      // key 8: delete of a key absent from the snapshot -> no-op
      (8L, 1, "D", "z", 0L))
      .toDF("k", "seq", "op", "s", "v")
    val out = ChangelogMerge.applyChangelog(snap, chg, "k", "seq", "op")
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    assert(out == Seq((2L, "b2", 220L), (3L, "c5", 350L),
      (4L, "d", 400L), (9L, "i", 900L)))
  }

  test("version ties resolve by the max full record, deterministically") {
    val chg = Seq(
      (1L, 7, "U", "p", 1L), (1L, 7, "U", "q", 2L), // same seq, same op
      (2L, 3, "D", "x", 0L), (2L, 3, "U", "y", 5L)) // same seq, U > D
      .toDF("k", "seq", "op", "s", "v")
    val out = ChangelogMerge.applyChangelog(snap, chg, "k", "seq", "op")
      .orderBy("k").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2))).toSeq
    // key 1: 'q' > 'p' in the payload tiebreak; key 2: op 'U' > 'D'
    assert(out == Seq((1L, "q", 2L), (2L, "y", 5L),
      (3L, "c", 300L), (4L, "d", 400L)))
  }

  test("scd2History: version chains, deletes close without emitting, " +
    "current flag on open versions") {
    val chg = Seq(
      // key 1: U(1) -> U(3) -> D(5): two history rows, none current
      (1L, 1, "U", "a1", 110L), (1L, 3, "U", "a3", 130L),
      (1L, 5, "D", "x", 0L),
      // key 2: I(2) -> U(4): two rows, the last current
      (2L, 2, "I", "b2", 220L), (2L, 4, "U", "b4", 240L))
      .toDF("k", "seq", "op", "s", "v")
    val out = ChangelogMerge.scd2History(chg, "k", "seq", "op")
      .orderBy("k", "valid_from").collect().map(r =>
        (r.getLong(0), r.getString(1), r.getLong(2), r.getInt(3),
          Option(r.get(4)).map(_.asInstanceOf[Int]),
          r.getBoolean(5))).toSeq
    assert(out == Seq(
      (1L, "a1", 110L, 1, Some(3), false),
      (1L, "a3", 130L, 3, Some(5), false),
      (2L, "b2", 220L, 2, Some(4), false),
      (2L, "b4", 240L, 4, None, true)))
  }

  test("empty changelog is the identity") {
    val chg = Seq.empty[(Long, Int, String, String, Long)]
      .toDF("k", "seq", "op", "s", "v")
    val out = ChangelogMerge.applyChangelog(snap, chg, "k", "seq", "op")
    assert(out.orderBy("k").collect().toSeq ==
      snap.orderBy("k").collect().toSeq)
  }
}
