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

  /** Full pipeline: mask then scale/offset (the coder order the reference
    * applies on open). */
  def decode(c: Column, fillValue: Any, scale: Double, offset: Double): Column =
    scaleOffsetDecode(maskDecode(c, fillValue), scale, offset)
}
