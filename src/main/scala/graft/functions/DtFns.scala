package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** The reference's `.dt` accessor surface (~40 methods,
  * `xarray/core/accessor_dt.py:243-700`) as native Column expressions.
  * Conventions follow xarray/pandas: dayofweek is Monday=0..Sunday=6,
  * season is meteorological DJF/MAM/JJA/SON.
  */
object DtFns {
  def yearD(t: Column): Column = year(t)
  def monthD(t: Column): Column = month(t)
  def dayD(t: Column): Column = dayofmonth(t)
  def hourD(t: Column): Column = hour(t)
  def minuteD(t: Column): Column = minute(t)
  def secondD(t: Column): Column = second(t)
  def microsecond(t: Column): Column =
    (unix_micros(t) % 1000000L + 1000000L) % 1000000L
  /** pandas `.dt.nanosecond` is the 0-999 ns component WITHIN the
    * microsecond — always 0 at Spark's µs timestamp resolution. (Sub-µs
    * components only exist when reading TIMESTAMP(NANOS) via nanosAsLong;
    * use `nanosecondOfLong` on that raw long instead.) */
  def nanosecond(t: Column): Column = lit(0L)

  /** ns-within-µs component of a raw epoch-nanos long (parquet
    * TIMESTAMP(NANOS) read with spark.sql.legacy.parquet.nanosAsLong). */
  def nanosecondOfLong(ns: Column): Column = (ns % 1000L + 1000L) % 1000L

  /** pandas dayofweek: Monday=0 .. Sunday=6 (Spark dayofweek is Sunday=1). */
  def dayofweek(t: Column): Column = (dayofweek_raw(t) + 5) % 7
  private def dayofweek_raw(t: Column): Column =
    org.apache.spark.sql.functions.dayofweek(t)
  def weekday(t: Column): Column = dayofweek(t)
  def dayofyearD(t: Column): Column = dayofyear(t)
  def quarterD(t: Column): Column = quarter(t)
  def daysInMonth(t: Column): Column = dayofmonth(last_day(t))
  def season(t: Column): Column = graft.agg.Groupers.season(t)
  def isLeapYear(t: Column): Column =
    (year(t) % 4 === 0 && year(t) % 100 =!= 0) || (year(t) % 400 === 0)
  def daysInYear(t: Column): Column = when(isLeapYear(t), 366).otherwise(365)
  def isMonthStart(t: Column): Column = dayofmonth(t) === 1
  def isMonthEnd(t: Column): Column = dayofmonth(t) === daysInMonth(t)
  def isQuarterStart(t: Column): Column =
    dayofmonth(t) === 1 && month(t).isin(1, 4, 7, 10)
  def isQuarterEnd(t: Column): Column =
    isMonthEnd(t) && month(t).isin(3, 6, 9, 12)
  def isYearStart(t: Column): Column = dayofyear(t) === 1
  def isYearEnd(t: Column): Column = month(t) === 12 && dayofmonth(t) === 31

  /** ISO calendar week (pandas `isocalendar().week`). */
  def week(t: Column): Column = weekofyear(t)

  /** decimal_year (ref `accessor_dt.py` decimal_year): year + elapsed
    * fraction; day-resolution variant (UTC, no sub-day component). */
  def decimalYear(t: Column): Column =
    year(t) + (dayofyear(t) - 1).cast("double") / daysInYear(t)

  def date(t: Column): Column = to_date(t)
  def floorDay(t: Column): Column = date_trunc("DAY", t)
  def floorHour(t: Column): Column = date_trunc("HOUR", t)
  def ceilDay(t: Column): Column =
    when(t === date_trunc("DAY", t), t)
      .otherwise(date_trunc("DAY", t + expr("INTERVAL 1 DAY")))
  def roundDay(t: Column): Column = {
    val f = date_trunc("DAY", t)
    val mid = timestamp_seconds(unix_timestamp(f) + 43200L)
    when(t < mid, f).otherwise(date_trunc("DAY", t + expr("INTERVAL 1 DAY")))
  }
  def strftime(t: Column, fmt: String): Column = date_format(t, fmt)

  /** timedelta total_seconds between two timestamps (µs exact). */
  def totalSeconds(a: Column, b: Column): Column =
    (unix_micros(a) - unix_micros(b)).cast("double") / 1e6

  // --- arbitrary-frequency floor/ceil/round (pandas dt.floor("15min")
  // family, ref `accessor_dt.py:283` _round_field). Pure long arithmetic
  // on epoch-µs — pmod keeps it exact where a double division would
  // truncate off-by-one near boundaries. ---
  def floorFreq(t: Column, usPeriod: Long): Column = {
    val us = unix_micros(t)
    timestamp_micros(us - pmod(us, lit(usPeriod)))
  }
  def ceilFreq(t: Column, usPeriod: Long): Column = {
    val m = unix_micros(t) + lit(usPeriod - 1L)
    timestamp_micros(m - pmod(m, lit(usPeriod)))
  }
  /** Half-up rounding (ties away from the past), matching the common
    * pandas freq-round expectation on positive epochs. */
  def roundFreq(t: Column, usPeriod: Long): Column = {
    val m = unix_micros(t) + lit(usPeriod / 2L)
    timestamp_micros(m - pmod(m, lit(usPeriod)))
  }

  // --- timedelta accessor components (ref `accessor_dt.py:660`
  // TimedeltaAccessor): pandas decomposition of a POSITIVE duration in
  // exact epoch-µs arithmetic — days, then seconds within the day, then
  // microseconds within the second. ---
  def tdMicrosBetween(a: Column, b: Column): Column =
    unix_micros(a) - unix_micros(b)
  def tdDays(us: Column): Column =
    ((us - pmod(us, lit(86400000000L))) / lit(86400000000L)).cast("long")
  def tdSeconds(us: Column): Column = {
    val inDay = pmod(us, lit(86400000000L))
    ((inDay - pmod(inDay, lit(1000000L))) / lit(1000000L)).cast("long")
  }
  def tdMicroseconds(us: Column): Column = pmod(us, lit(1000000L))
  def tdTotalSeconds(us: Column): Column = us.cast("double") / 1e6

  // --- isocalendar (ref `accessor_dt.py:561`): ISO 8601 (year, week, day).
  // ISO year computed as the year of that week's Thursday, so it matches
  // isoyear() in any engine without week-based-year format patterns. ---
  def isoDay(t: Column): Column = dayofweek(t) + 1 // our dayofweek: 0=Monday
  def isoWeek(t: Column): Column = weekofyear(t)
  def isoYear(t: Column): Column =
    year(date_add(to_date(t), (lit(4) - isoDay(t)).cast("int")))
}
