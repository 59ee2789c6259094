package graft

import org.apache.spark.sql.functions._
import graft.agg.Groupers
import graft.exprs.MathExprs

/** SeasonResampler building blocks (ref `groupers.py:682,874`) and the
  * MathExprs ufunc expressions. */
class GroupersSeasonSpec extends SparkSpec {
  import spark.implicits._

  test("seasonMonths matches the reference doctests (groupers.py:682)") {
    assert(Groupers.seasonMonths(Seq("DJF", "MAM", "JJA", "SON")) ===
      Seq(Seq(12, 1, 2), Seq(3, 4, 5), Seq(6, 7, 8), Seq(9, 10, 11)))
    // overlap is legal for the GROUPER (groupers.py doctest) ...
    assert(Groupers.seasonMonths(Seq("DJFM", "SOND")) ===
      Seq(Seq(12, 1, 2, 3), Seq(9, 10, 11, 12)))
    // single-letter seasons disambiguate via the next season's first letter
    assert(Groupers.seasonMonths(Seq("JF", "MAM", "JJAS", "OND")) ===
      Seq(Seq(1, 2), Seq(3, 4, 5), Seq(6, 7, 8, 9), Seq(10, 11, 12)))
    // ... but the RESAMPLER label rejects it (SeasonResampler contract)
    intercept[IllegalArgumentException] {
      Groupers.seasonLabel(lit("2001-01-01").cast("timestamp"),
        Seq("DJFM", "MAMJ")) // overlap (M twice)
    }
  }

  test("seasonLabel wraps Jan/Feb into December's year; off-season is null") {
    val df = Seq("2001-01-15", "2001-02-01", "2000-12-25", "2001-06-10")
      .toDF("d").select(to_timestamp(col("d")).as("t"))
    val lab = df.select(Groupers.seasonLabel(col("t"),
      Seq("DJF", "JJA")).cast("string").as("l")).collect().map(_.getString(0))
    assert(lab(0) === "2000-12-01 00:00:00") // Jan 2001 -> DJF of 2000
    assert(lab(1) === "2000-12-01 00:00:00")
    assert(lab(2) === "2000-12-01 00:00:00") // Dec keeps its own year
    assert(lab(3) === "2001-06-01 00:00:00") // JJA, no wrap
    // months in no listed season -> null
    val nul = df.select(Groupers.seasonLabel(col("t"), Seq("MAM")).as("l"))
      .filter(col("l").isNull).count()
    assert(nul === 4)
  }

  test("MathExprs: gcd/lcm/nextafter/spacing laws") {
    val df = Seq((12L, 18L), (0L, 5L), (0L, 0L), (-4L, 6L)).toDF("a", "b")
    val rows = df.select(MathExprs.gcd(col("a"), col("b")).as("g"),
      MathExprs.lcm(col("a"), col("b")).as("l")).collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ===
      Seq((6L, 36L), (5L, 0L), (0L, 0L), (2L, 12L)))
    val one = Seq(1.0).toDF("x")
    val Array(r) = one.select(
      MathExprs.nextafter(col("x"), lit(2.0)).as("na"),
      MathExprs.spacing(col("x")).as("sp"),
      MathExprs.spacing(-col("x")).as("spn")).collect()
    assert(r.getDouble(0) === Math.nextAfter(1.0, 2.0))
    assert(r.getDouble(1) === Math.ulp(1.0))
    assert(r.getDouble(2) === -Math.ulp(1.0)) // sign follows x
    val s = Seq("e\u0301A").toDF("s")
      .select(MathExprs.unicodeNormalize(col("s"), "NFC").as("n"))
      .head().getString(0)
    // decomposed e + combining acute composes to U+00E9 under NFC
    assert(s === "\u00e9A")
  }
}
