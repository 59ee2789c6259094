package graft

import org.apache.spark.sql.functions._
import graft.window.Funnel

/** Ordered-funnel contract: strictly-after stage ordering, NULL cascade
  * on abandonment, entry gated on stage 1. */
class FunnelSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: (Long, Long, String)*) =
    rows.toDF("user_id", "t", "event_type")
      .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
        col("event_type"))

  test("strictly-after ordering: an earlier purchase does not complete") {
    val events = ev(
      (1L, 10L, "view"), (1L, 20L, "click"), (1L, 30L, "purchase"),
      // user 2 purchased BEFORE viewing: funnel stops after click
      (2L, 5L, "purchase"), (2L, 10L, "view"), (2L, 20L, "click"),
      // user 3 views only
      (3L, 10L, "view"),
      // user 4 never views: not in the funnel at all
      (4L, 10L, "click"), (4L, 20L, "purchase"))
    val out = Funnel.ordered(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
      .collect().map(r => r.getLong(0) ->
        (r.isNullAt(2), r.isNullAt(3), r.getInt(4))).toMap
    assert(out(1L) === ((false, false, 3)))
    assert(out(2L) === ((false, true, 2)))
    assert(out(3L) === ((true, true, 1)))
    assert(!out.contains(4L))
  }

  test("earliest in-order times are picked, not just any") {
    val events = ev(
      (1L, 10L, "view"), (1L, 12L, "view"),        // t_view = 10
      (1L, 8L, "click"), (1L, 15L, "click"),       // only 15 is after 10
      (1L, 16L, "purchase"))
    val r = Funnel.ordered(events, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase")).head()
    assert(r.getTimestamp(1).getTime === 10000L)
    assert(r.getTimestamp(2).getTime === 15000L)
    assert(r.getTimestamp(3).getTime === 16000L)
    assert(r.getInt(4) === 3)
  }
}
