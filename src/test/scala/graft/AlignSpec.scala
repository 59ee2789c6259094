package graft

import org.apache.spark.sql.functions._
import graft.model.XDataset
import graft.align.{Align, AsOf}

/** F4 alignment-pair semantics (FIXTURES.md): join modes, combine_first,
  * as-of joins — the reference's `structure/alignment.py` laws. */
class AlignSpec extends SparkSpec {
  import spark.implicits._

  private def left = XDataset(
    Seq((35.0, 1.0), (40.0, 2.0)).toDF("lat", "v_l"), dims = Seq("lat"))
  private def right = XDataset(
    Seq((35.0, 10.0), (42.0, 20.0)).toDF("lat", "v_r"), dims = Seq("lat"))

  test("align join modes produce the documented key sets") {
    assert(Align.join(left, right, "inner").select("lat").as[Double]
      .collect().toSet === Set(35.0))
    assert(Align.join(left, right, "outer").select("lat").as[Double]
      .collect().toSet === Set(35.0, 40.0, 42.0))
    assert(Align.join(left, right, "left").select("lat").as[Double]
      .collect().toSet === Set(35.0, 40.0))
    assert(Align.join(left, right, "right").select("lat").as[Double]
      .collect().toSet === Set(35.0, 42.0))
  }

  test("join='exact' raises on mismatched keys (AlignmentError analog)") {
    intercept[IllegalArgumentException] { Align.exact(left, right) }
  }

  test("combine_first: self wins, other fills holes (ref dataset.py:6845)") {
    val out = Align.combineFirst(left, right, Seq(("v_l", "v_r", "v")))
      .orderBy("lat").as[(Double, Double)].collect()
    assert(out.toSeq === Seq((35.0, 1.0), (40.0, 2.0), (42.0, 20.0)))
  }

  test("as-of backward picks latest obs <= key, inclusive") {
    val probes = Seq((1L, 10L, 100L), (1L, 20L, 101L), (1L, 5L, 102L))
      .toDF("g", "k", "pid")
    val obs = Seq((1L, 10L, 1.0), (1L, 15L, 2.0)).toDF("g", "k", "ov")
    val out = AsOf.backward(probes, obs, Seq("g"), "k", Seq("ov"))
      .select("pid", "ov").as[(Long, Option[Double])].collect().toMap
    assert(out(100L).contains(1.0))   // k=10 matches obs at 10 (inclusive)
    assert(out(101L).contains(2.0))   // k=20 -> latest obs 15
    assert(out(102L).isEmpty)         // k=5 -> nothing before
  }

  test("as-of forward picks earliest obs >= key, inclusive") {
    val probes = Seq((1L, 10L, 100L), (1L, 16L, 101L)).toDF("g", "k", "pid")
    val obs = Seq((1L, 10L, 1.0), (1L, 15L, 2.0)).toDF("g", "k", "ov")
    val out = AsOf.forward(probes, obs, Seq("g"), "k", Seq("ov"))
      .select("pid", "ov").as[(Long, Option[Double])].collect().toMap
    assert(out(100L).contains(1.0))
    assert(out(101L).isEmpty)
  }

  test("align override: left labels, right values by position") {
    val out = Align.overrideAlign(left, right, "lat")
      .orderBy("lat").as[(Double, Double, Double)].collect()
    // left keeps its labels {35, 40}; right values joined positionally
    assert(out.map(_._1).toSeq === Seq(35.0, 40.0))
    assert(out.map(_._3).toSeq === Seq(10.0, 20.0))
  }

  test("as-of tolerance nulls matches beyond the bound") {
    val probes = Seq((1L, 100L, 1L), (1L, 200L, 2L)).toDF("g", "k", "pid")
    val obs = Seq((1L, 95L, 1.0), (1L, 120L, 2.0)).toDF("g", "k", "ov")
    val joined = AsOf.backward(probes, obs, Seq("g"), "k", Seq("ov"))
      .withColumn("__mk", lit(null).cast("long"))  // carry matched key below
    // re-run carrying the matched key for the tolerance filter
    val withKey = AsOf.backward(probes,
      obs.withColumn("mk", col("k")), Seq("g"), "k", Seq("ov", "mk"))
    val out = AsOf.withTolerance(withKey, "k", "mk", Seq("ov"), tolerance = 10L)
      .select("pid", "ov").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(1.0))   // |100-95| = 5 <= 10
    assert(out(2L).isEmpty)         // |200-120| = 80 > 10 -> nulled
  }

  test("reindex materializes missing labels with fill (ref dataset.py:3546)") {
    val target = Seq(35.0, 40.0, 99.0).toDF("lat")
    val out = Align.reindex(target, left, fill = Map("v_l" -> 0.0))
      .orderBy("lat").as[(Double, Double)].collect()
    assert(out.toSeq === Seq((35.0, 1.0), (40.0, 2.0), (99.0, 0.0)))
  }

  test("reindex_like conforms to the OTHER object's labels (dataset.py:3704)") {
    // like's label set {35, 42}: 40 drops, 42 materializes with the fill
    val out = Align.reindexLike(left, right, "lat", fill = Map("v_l" -> -1.0))
      .orderBy("lat").as[(Double, Double)].collect()
    assert(out.toSeq === Seq((35.0, 1.0), (42.0, -1.0)))
  }

  test("interp_like evaluates at the other object's coords (dataset.py:4158)") {
    val series = Seq((1L, 10L, 1.0), (1L, 20L, 3.0)).toDF("g", "t", "v")
      .select(col("g"), timestamp_seconds(col("t")).as("t"), col("v"))
    val other = Seq(15L, 20L, 30L).toDF("t")
      .select(timestamp_seconds(col("t")).as("t"))
    val out = Align.interpLike(series, other, by = Seq("g"), t = "t", v = "v")
      .select(unix_seconds(col("t")), col("v_interp"))
      .as[(Long, Option[Double])].collect().toMap
    assert(out(15L).contains(2.0))  // midpoint lerp
    assert(out(20L).contains(3.0))  // exact knot
    assert(out(30L).isEmpty)        // outside range -> NULL, no extrapolation
  }

  test("interval join: containment bounds inclusive, multi-bucket spans exact") {
    import graft.align.IntervalJoin
    def ts(s: Long) = timestamp_seconds(lit(s))
    val points = Seq((1L, 0L), (1L, 100L), (1L, 5000L), (1L, 9999L),
      (2L, 100L))
      .toDF("g", "t").select(col("g"),
        timestamp_seconds(col("t")).as("ts"))
    // interval [100, 5000] spans many 1000-second buckets; [0,0] is a
    // degenerate point interval
    val ivs = Seq((1L, 100L, 5000L, "a"), (1L, 0L, 0L, "b"),
      (2L, 0L, 50L, "c"))
      .toDF("g", "s", "e", "tag")
      .select(col("g"), timestamp_seconds(col("s")).as("s"),
        timestamp_seconds(col("e")).as("e"), col("tag"))
    val out = IntervalJoin.pointInInterval(points, ivs, Seq("g"), "ts",
      "s", "e", bucketMicros = 1000L * 1000000L)
      .select(col("g"), unix_seconds(col("ts")).as("t"), col("tag"))
      .as[(Long, Long, String)].collect().toSet
    // inclusive bounds both ends; 9999 outside; group-2 point outside c
    assert(out === Set((1L, 100L, "a"), (1L, 5000L, "a"), (1L, 0L, "b")))
  }

  test("broadcast_like expands over the other's extra dims (dataarray.py:1561)") {
    val grid = XDataset(
      Seq((35.0, "a", 1), (35.0, "b", 2), (40.0, "a", 3))
        .toDF("lat", "band", "n"), dims = Seq("lat", "band"))
    val out = Align.broadcastLike(left, grid)
      .orderBy("lat", "band").as[(Double, Double, String)].collect()
    // every self row repeats per extra-dim label; values unchanged
    assert(out.toSeq === Seq((35.0, 1.0, "a"), (35.0, 1.0, "b"),
      (40.0, 2.0, "a"), (40.0, 2.0, "b")))
    // no extra dims -> identity
    assert(Align.broadcastLike(left, right).collect().length === 2)
  }
}
