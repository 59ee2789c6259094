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

  test("sessions: exactly-gap splits (session_window's end-exclusive bound)") {
    import graft.window.Sessions
    val events = ev(
      (1L, 0L, "view"), (1L, 29L, "view"),   // 29s < gap: same session
      (1L, 59L, "view"),                     // 30s = gap: NEW session
      (2L, 0L, "view"))
    val out = Sessions.stats(events, "user_id", "ts", gapSec = 30)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(4), r.getLong(5))).toMap
    assert(out((1L, 1L)) === ((2L, 29L)))   // 2 events, 29s duration
    assert(out((1L, 2L)) === ((1L, 0L)))
    assert(out((2L, 1L)) === ((1L, 0L)))
  }

  test("transitions: counts conserve (rows - entities), shares bound 1e6") {
    import graft.window.Markov
    val events = Seq(
      (1L, 1L, "a"), (1L, 2L, "b"), (1L, 3L, "a"),
      (2L, 1L, "a"), (2L, 2L, "a"))
      .toDF("user_id", "t", "event_type")
      .select(col("user_id"), timestamp_seconds(col("t")).as("ts"),
        col("event_type"), col("t").as("event_id"))
    val out = Markov.transitions(events, "user_id", "ts", "event_type",
      col("event_id")).collect()
    // 5 events over 2 users -> 3 transitions: a->b, b->a, a->a
    assert(out.map(_.getLong(2)).sum === 3L)
    val m = out.map(r => (r.getString(0), r.getString(1)) ->
      (r.getLong(2), r.getLong(3))).toMap
    assert(m(("a", "b")) === ((1L, 500000L)))  // a's mass splits 1/2
    assert(m(("a", "a")) === ((1L, 500000L)))
    assert(m(("b", "a")) === ((1L, 1000000L)))
    out.groupBy(_.getString(0)).values.foreach { g =>
      assert(g.map(_.getLong(3)).sum <= 1000000L) // floor shares
    }
  }

  test("cohort: pre-anchor activity excluded; week 0 retention is 1e6 ppm") {
    import graft.window.Cohort
    val day = 86400L
    val events = ev(
      (1L, 0L, "signup"), (1L, 8 * day, "click"),       // week 1 active
      (2L, 0L, "signup"),                               // week 0 only
      (2L, -3 * day, "click"),                          // pre-anchor: ignored
      (3L, 1L * day, "click"))                          // never signed up
    val out = Cohort.weeklyRetention(events, "user_id", "ts",
      "event_type", "signup")
      .collect().map(r => (r.getDate(0).toString, r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out(("1970-01-01", 0L)) === ((2L, 2L, 1000000L)))
    assert(out(("1970-01-01", 1L)) === ((2L, 1L, 500000L)))
    assert(out.size === 2) // no negative weeks, no cohortless user rows
  }
}
