package graft

import java.sql.Timestamp
import org.apache.spark.sql.functions._
import graft.align.Attribution

/** Linear multi-touch attribution vs hand-computed credits: equal ppm
  * split, inclusive window boundaries, the (none) bucket, and the
  * truncating-division remainder contract. */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)
  private val day = 24L * 3600 * 1000000L

  test("equal split on the ppm grid, window boundaries inclusive, " +
    "(none) bucket for untouched conversions") {
    // user 1: conversion at day 10 worth 300 cents; touches at day 4
    // (click), day 8 (view), day 3 - 1us (outside the 7-day lookback)
    val conv = Seq(
      (1L, ts("2024-01-10 00:00:00"), 100L, 300L),
      (2L, ts("2024-01-10 00:00:00"), 101L, 500L)) // user 2: no touches
      .toDF("user_id", "t", "conv_id", "value_c")
    val touches = Seq(
      (1L, ts("2024-01-04 00:00:00"), "click"),
      (1L, ts("2024-01-08 00:00:00"), "view"),
      (1L, ts("2024-01-03 00:00:00"), "click"), // exactly 7 days: IN
      (1L, ts("2024-01-02 23:59:59"), "click"), // outside
      (3L, ts("2024-01-08 00:00:00"), "view")) // other user: never joins
      .toDF("user_id", "t", "tt")
    val out = Attribution.linearTouch(conv, touches,
        "user_id", "t", "conv_id", "value_c", "tt",
        lookbackMicros = 7L * day, bucketMicros = day)
      .orderBy("attributed").collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getLong(2))).toSeq
    // 3 touches share 300 cents: each gets 300*1e6 div 3 = 100e6 ppm
    assert(out == Seq(
      ("(none)", 1L, 500L * 1000000L),
      ("click", 2L, 2L * 100000000L),
      ("view", 1L, 100000000L)))
  }

  test("truncating division undershoots by < n ppm and is exact") {
    // 100 cents over 3 touches: each 33333333 ppm, total 99999999 —
    // the documented fixed-point remainder of 1 ppm
    val conv = Seq((1L, ts("2024-01-10 00:00:00"), 1L, 100L))
      .toDF("user_id", "t", "conv_id", "value_c")
    val touches = Seq(
      (1L, ts("2024-01-09 00:00:00"), "a"),
      (1L, ts("2024-01-08 00:00:00"), "a"),
      (1L, ts("2024-01-07 00:00:00"), "a"))
      .toDF("user_id", "t", "tt")
    val out = Attribution.linearTouch(conv, touches,
        "user_id", "t", "conv_id", "value_c", "tt",
        lookbackMicros = 7L * day, bucketMicros = day).collect()
    assert(out.length == 1)
    assert(out.head.getLong(1) == 3L)
    assert(out.head.getLong(2) == 3L * 33333333L)
  }

  test("markov removal attribution matches the hand-solved chain") {
    // A: click->purchase, B: click (null), C: view->click->purchase,
    // D: view (null). True absorption from START = 1/2; removal(click)
    // = 1/2, removal(view) = 1/6 -> shares 3/4 and 1/4.
    val ev = Seq(
      (1L, ts("2024-01-01 00:00:00"), "click", 10L),
      (1L, ts("2024-01-01 01:00:00"), "purchase", 11L),
      (2L, ts("2024-01-01 00:00:00"), "click", 20L),
      (3L, ts("2024-01-01 00:00:00"), "view", 30L),
      (3L, ts("2024-01-01 01:00:00"), "click", 31L),
      (3L, ts("2024-01-01 02:00:00"), "purchase", 32L),
      (4L, ts("2024-01-01 00:00:00"), "view", 40L))
      .toDF("user_id", "t", "et", "eid")
    val out = graft.window.Markov.removalAttribution(
        ev, "user_id", "t", "et", col("eid"), "purchase", iters = 12)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // ppb fixed-point Jacobi: p_click=666666666, p_view=333333333,
    // p_START=499999999 (exact truncating-division values)
    val (pf, prC, remC, shC) = out("click")
    assert(pf == 499999999L, s"p_full $pf")
    assert(prC == 0L && remC == 499999999L, s"click $prC $remC")
    assert(shC == 750000L, s"click share $shC")
    val (_, prV, remV, shV) = out("view")
    assert(prV == 333333333L && remV == 166666666L, s"view $prV $remV")
    assert(shV == 249999L, s"view share $shV")
    // events after the first purchase never count: a post-conversion
    // tail must not change anything
    val ev2 = ev.union(Seq((1L, ts("2024-01-02 00:00:00"), "view", 12L))
      .toDF("user_id", "t", "et", "eid"))
    val out2 = graft.window.Markov.removalAttribution(
        ev2, "user_id", "t", "et", col("eid"), "purchase", iters = 12)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(out2 == out)
  }
}
