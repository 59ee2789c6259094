package graft.io

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** CF-conventions decode pipeline as scan-time column expressions
  * (ref `conventions.py:109` `decode_cf_variable`; coders
  * `coding/variables.py:269` CFMaskCoder, `:493` CFScaleOffsetCoder,
  * `coding/times.py:535` decode_cf_datetime).
  *
  * In the reference these are lazy array wrappers; here they are ordinary
  * projections, so Catalyst folds them into the parquet scan stage and
  * predicate pushdown still applies to the raw columns.
  */
object CFDecode {

  /** _FillValue/missing_value -> NULL (CFMaskCoder). */
  def maskDecode(c: Column, fillValue: Any): Column =
    when(c === lit(fillValue), lit(null)).otherwise(c)

  /** scale_factor/add_offset decode (CFScaleOffsetCoder):
    * decoded = raw * scale + offset. */
  def scaleOffsetDecode(c: Column, scale: Double, offset: Double): Column =
    c * lit(scale) + lit(offset)

  /** Inverse for writing. */
  def scaleOffsetEncode(c: Column, scale: Double, offset: Double): Column =
    round((c - lit(offset)) / lit(scale), 0)

  /** "days since <epoch>" numeric time decode (decode_cf_datetime,
    * proleptic-gregorian/standard calendar on in-range dates). */
  def timeDecodeDays(c: Column, epochIso: String): Column =
    timestamp_seconds(unix_timestamp(lit(epochIso).cast("timestamp")) +
      c.cast("long") * 86400L)

  /** "seconds since <epoch>" decode. */
  def timeDecodeSeconds(c: Column, epochIso: String): Column =
    timestamp_seconds(unix_timestamp(lit(epochIso).cast("timestamp")) + c.cast("long"))

  /** Encode a timestamp as days since epoch. */
  def timeEncodeDays(t: Column, epochIso: String): Column =
    ((unix_timestamp(t) - unix_timestamp(lit(epochIso).cast("timestamp"))) / 86400L)
      .cast("long")

  /** uint8 boolean decode (BooleanCoder). */
  def booleanDecode(c: Column): Column = c =!= 0

  // --- noleap (365_day) cftime calendar (ref `coding/times.py` cftime
  // path; `core/dataset.py:10011` convert_calendar). Spark has no native
  // type for it, so noleap dates are an encoded (year, month, day, doy) struct
  // computed from "days since year-start-of-epoch" with fixed month
  // lengths — expression-only, no UDF. ---

  private val monthStartsNoLeap = Seq(0, 31, 59, 90, 120, 151, 181, 212,
    243, 273, 304, 334, 365)

  /** Decode days-since(epochYear-01-01) in the noleap calendar to a
    * (year, month, day, doy) struct. */
  def noleapDecode(days: Column, epochYear: Int): Column = {
    val year = (days.cast("long") / 365L).cast("int") + epochYear
    val doy = pmod(days.cast("long"), lit(365L)).cast("int") // 0-based
    val month = monthStartsNoLeap.sliding(2).toSeq.zipWithIndex
      .foldLeft(lit(12)) { case (acc, (bounds, i)) =>
        when(doy >= bounds.head && doy < bounds(1), i + 1).otherwise(acc)
      }
    val mStart = monthStartsNoLeap.dropRight(1).zipWithIndex.foldLeft(lit(334)) {
      case (acc, (start, i)) => when(month === i + 1, start).otherwise(acc)
    }
    struct(year.as("year"), month.as("month"),
      (doy - mStart + 1).as("day"), (doy + 1).as("doy"))
  }

  /** Encode (year, month, day) noleap fields back to days since epoch. */
  def noleapEncode(year: Column, month: Column, day: Column, epochYear: Int): Column = {
    val mStart = monthStartsNoLeap.dropRight(1).zipWithIndex.foldLeft(lit(334)) {
      case (acc, (start, i)) => when(month === i + 1, start).otherwise(acc)
    }
    (year - epochYear).cast("long") * 365L + mStart + day.cast("long") - 1L
  }

  /** Full pipeline: mask then scale/offset (the coder order the reference
    * applies on open). */
  def decode(c: Column, fillValue: Any, scale: Double, offset: Double): Column =
    scaleOffsetDecode(maskDecode(c, fillValue), scale, offset)
}
