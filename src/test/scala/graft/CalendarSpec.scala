package graft

import org.apache.spark.sql.functions._
import graft.io.CFDecode

/** cftime calendar family vs dates cftime/xarray would produce
  * (ref `coding/times.py` cftime decode; calendar definitions are the CF
  * conventions ones: 360_day = twelve 30-day months, all_leap = every year
  * 366 days, julian = leap every 4 years with no century rule). */
class CalendarSpec extends SparkSpec {
  import spark.implicits._

  private def decode(cal: String, days: Long, epoch: Int = 2000): (Int, Int, Int) = {
    val df = Seq(days).toDF("d")
    val s = cal match {
      case "360_day"  => CFDecode.cal360Decode(col("d"), epoch)
      case "all_leap" => CFDecode.allLeapDecode(col("d"), epoch)
      case "julian"   => CFDecode.julianDecode(col("d"), epoch)
      case "noleap"   => CFDecode.noleapDecode(col("d"), epoch)
    }
    val r = df.select(s.as("s")).select("s.year", "s.month", "s.day").head()
    (r.getInt(0), r.getInt(1), r.getInt(2))
  }

  test("360_day: fixed 30-day months") {
    assert(decode("360_day", 0L) === ((2000, 1, 1)))
    assert(decode("360_day", 29L) === ((2000, 1, 30)))
    assert(decode("360_day", 30L) === ((2000, 2, 1)))
    assert(decode("360_day", 59L) === ((2000, 2, 30))) // Feb 30 exists
    assert(decode("360_day", 359L) === ((2000, 12, 30)))
    assert(decode("360_day", 360L) === ((2001, 1, 1)))
  }

  test("all_leap: every year has Feb 29") {
    assert(decode("all_leap", 59L) === ((2000, 2, 29)))
    assert(decode("all_leap", 366L + 59L) === ((2001, 2, 29))) // 2001 too
    assert(decode("all_leap", 365L) === ((2000, 12, 31)))
    assert(decode("all_leap", 366L) === ((2001, 1, 1)))
  }

  test("julian: leap every 4 years, century years included") {
    // 2000 is leap in both; day 59 = Feb 29
    assert(decode("julian", 59L) === ((2000, 2, 29)))
    // 2001-2003 not leap: 2001 starts at 366
    assert(decode("julian", 366L) === ((2001, 1, 1)))
    assert(decode("julian", 366L + 59L) === ((2001, 3, 1)))
    // julian year 2100 IS leap (no century rule): days to 2100-01-01 =
    // 25 cycles * 1461 = 36525
    assert(decode("julian", 36525L + 59L) === ((2100, 2, 29)))
  }

  test("pre-epoch (negative days) decode consistently — floor division") {
    // day -1 is the last day of the year BEFORE the epoch in every calendar;
    // truncating division would pair year=epoch with a floored pmod doy and
    // emit an impossible date like 2000-12-30 for day -1.
    assert(decode("360_day", -1L) === ((1999, 12, 30)))
    assert(decode("360_day", -360L) === ((1999, 1, 1)))
    assert(decode("all_leap", -1L) === ((1999, 12, 31)))
    assert(decode("all_leap", -366L) === ((1999, 1, 1)))
    assert(decode("noleap", -1L) === ((1999, 12, 31)))
    assert(decode("noleap", -365L) === ((1999, 1, 1)))
    // julian: 1999 is not a leap year (1996 is); day -1 = 1999-12-31
    assert(decode("julian", -1L) === ((1999, 12, 31)))
    // back a full cycle: -1461 = 1996-01-01 (leap year start)
    assert(decode("julian", -1461L) === ((1996, 1, 1)))
    assert(decode("julian", -1461L + 59L) === ((1996, 2, 29)))
  }

  test("roundtrip encode(decode(d)) == d across a leap cycle") {
    val days = spark.range(-3000, 3000).toDF("d")
    def rt(dec: org.apache.spark.sql.Column,
           enc: (org.apache.spark.sql.Column, org.apache.spark.sql.Column,
             org.apache.spark.sql.Column) => org.apache.spark.sql.Column) = {
      val bad = days.select(col("d"), dec.as("s"))
        .select(col("d"), enc(col("s.year"), col("s.month"), col("s.day")).as("rt"))
        .filter(col("d") =!= col("rt")).count()
      assert(bad === 0L)
    }
    rt(CFDecode.cal360Decode(col("d"), 2000),
      (y, m, d) => CFDecode.cal360Encode(y, m, d, 2000))
    rt(CFDecode.allLeapDecode(col("d"), 2000),
      (y, m, d) => CFDecode.allLeapEncode(y, m, d, 2000))
    rt(CFDecode.julianDecode(col("d"), 2000),
      (y, m, d) => CFDecode.julianEncode(y, m, d, 2000))
  }

  test("cftime date_range(freq=MS) lands on month starts in every calendar") {
    for (cal <- Seq("360_day", "noleap", "all_leap", "julian")) {
      val days = CFDecode.cftimeRangeMonthStarts(cal, 2000, 2003, 26)
      assert(days.size === 26)
      assert(days === days.sorted)
      val df = days.toDF("d")
      val dec = cal match {
        case "360_day"  => CFDecode.cal360Decode(col("d"), 2000)
        case "noleap"   => CFDecode.noleapDecode(col("d"), 2000)
        case "all_leap" => CFDecode.allLeapDecode(col("d"), 2000)
        case "julian"   => CFDecode.julianDecode(col("d"), 2000)
      }
      val rows = df.select(dec.as("s")).select("s.year", "s.month", "s.day")
        .collect()
      assert(rows.forall(_.getInt(2) == 1), s"$cal: not all day-1")
      assert(rows.map(r => (r.getInt(0), r.getInt(1))).toSeq ===
        (0 until 26).map(k => (2003 + k / 12, k % 12 + 1)))
    }
  }

  test("convert_calendar between non-standard calendars keeps (y,m,d) identity") {
    // all_leap 2001-02-29 does not exist in noleap -> NULL; -01-31 does not
    // exist in 360_day -> NULL; valid dates land on the same (y,m,d)
    val df = Seq((2001, 2, 29), (2001, 1, 31), (2001, 3, 15)).toDF("y", "m", "d")
    val out = df.select(
      CFDecode.convertCalendar(col("y"), col("m"), col("d"), "noleap", 2000).as("nl"),
      CFDecode.convertCalendar(col("y"), col("m"), col("d"), "360_day", 2000).as("c360"))
      .collect()
    assert(out(0).isNullAt(0))          // Feb 29 -> noleap: dropped
    assert(!out(0).isNullAt(1))         // Feb 29 -> 360_day: exists
    assert(out(1).isNullAt(1))          // Jan 31 -> 360_day: dropped
    assert(!out(1).isNullAt(0))         // Jan 31 -> noleap: exists
    // roundtrip identity on the valid date
    val back = Seq(out(2).getLong(0)).toDF("days")
      .select(CFDecode.noleapDecode(col("days"), 2000).as("s"))
      .select("s.year", "s.month", "s.day").head()
    assert((back.getInt(0), back.getInt(1), back.getInt(2)) === ((2001, 3, 15)))
  }

  test("convert_calendar to standard nulls dates that don't exist") {
    val df = Seq((2100, 2, 29), (2000, 2, 29), (2001, 2, 30), (2004, 2, 29))
      .toDF("y", "m", "d")
    val out = df.select(date_format(
      CFDecode.toStandardDate(col("y"), col("m"), col("d")), "yyyy-MM-dd").as("s"))
      .collect().map(_.getString(0)).toSeq
    assert(out === Seq(null, "2000-02-29", null, "2004-02-29"))
  }

  test("proleptic_gregorian decode/encode roundtrip across century rules") {
    // 2100 is NOT a leap year (century), 2000 IS (quadricentennial)
    val days = Seq(0L, 59L, 60L, 36524L, 36585L, 150000L)
    val df = days.toDF("days")
      .select(col("days"), CFDecode.prolepticDecode(col("days"), 2000).as("p"))
      .select(col("days"), col("p.year"), col("p.month"), col("p.day"),
        CFDecode.prolepticEncode(col("p.year"), col("p.month"), col("p.day"),
          2000).as("rt"))
      .collect()
    df.foreach(r => assert(r.getLong(4) === r.getLong(0)))
    // day 59 = 2000-02-29 (leap); day 36585 = 2100-03-02 (2100 NOT leap)
    val d59 = df.find(_.getLong(0) == 59L).get
    assert((d59.getInt(1), d59.getInt(2), d59.getInt(3)) === ((2000, 2, 29)))
    val d36585 = df.find(_.getLong(0) == 36585L).get
    assert((d36585.getInt(1), d36585.getInt(2), d36585.getInt(3)) ===
      ((2100, 3, 2)))
  }

  test("cftime_range anchors: julian leap handling and n-multiples") {
    // julian: 2100 IS a leap year (no century rule), so noleap/julian
    // diverge at 2100-02-end; ME of Feb 2100 in julian = day 29
    val jME = CFDecode.cftimeRange("julian", 2000, 2100, 2, "ME")
    val nME = CFDecode.cftimeRange("noleap", 2000, 2100, 2, "ME")
    // Feb end (index 1): julian Feb has 29 days in 2100, noleap 28
    assert(jME(1) - jME(0) === 29)
    assert(nME(1) - nME(0) === 28)
    // n-multiple: 3D steps by 3 days
    assert(CFDecode.cftimeRange("360_day", 2000, 2001, 4, "3D") ===
      Seq(360L, 363L, 366L, 369L))
    // QE/YE land one day before the next anchor's start
    val qs = CFDecode.cftimeRange("proleptic_gregorian", 2000, 2001, 2, "QS")
    val qe = CFDecode.cftimeRange("proleptic_gregorian", 2000, 2001, 1, "QE")
    assert(qe.head === qs(1) - 1)
  }

  // --- date_range_like (ref `coding/cftime_offsets.py:1553`) + the
  // infer_freq it builds on (`coding/frequencies.py:34`) ---

  test("infer_freq: anchored month rules win over constant day spacing") {
    def me(cal: String, months: Range) =
      months.map(m => CFDecode.monthEndDay(cal, 2000, 2000, m))
    assert(CFDecode.inferFreqDays("standard", 2000,
      me("standard", 1 to 12)) === Some("ME"))
    // 360_day month-ends are exactly 30 days apart — must still be ME,
    // because ME and 30D convert differently across calendars
    assert(CFDecode.inferFreqDays("360_day", 2000,
      me("360_day", 1 to 4)) === Some("ME"))
    assert(CFDecode.inferFreqDays("noleap", 2000,
      Seq(0L, 730L, 1460L)) === Some("2YS")) // Jan 1 every 2nd noleap year
    assert(CFDecode.inferFreqDays("standard", 2000,
      Seq(0L, 3L, 6L, 9L)) === Some("3D"))
    // monthly on day 15: not an anchored rule, not constant-day -> None
    assert(CFDecode.inferFreqDays("standard", 2000,
      (1 to 5).map(m => CFDecode.dayOfYmd("standard", 2000, 2000, m, 15)))
      === None)
    assert(CFDecode.inferFreqDays("standard", 2000, Seq(0L, 1L)) === None)
  }

  test("date_range_like ME: leap-year Feb 29 becomes noleap Feb 28") {
    val src = (1 to 12).map(m => CFDecode.monthEndDay("standard", 2000, 2000, m))
    val out = CFDecode.dateRangeLike(src, "standard", "noleap", 2000)
    assert(out === (1 to 12).map(m => CFDecode.monthEndDay("noleap", 2000, 2000, m)))
    assert(out(1) === 58L) // noleap Feb 28 = 31 + 28 - 1 days since Jan 1
  }

  test("date_range_like daily: month-end source end snaps to target month end") {
    // noleap February 2000, daily -> standard 2000 gains Feb 29 (the
    // reference's "daily or coarser ending on the last day of the month")
    val src = (31L to 58L) // noleap Feb 1 .. Feb 28
    val out = CFDecode.dateRangeLike(src, "noleap", "standard", 2000)
    assert(out === (31L to 59L)) // standard Feb 1 .. Feb 29
  }

  test("date_range_like daily: length follows the target calendar span") {
    // standard 2001-01-01..2001-03-01 is 60 dates; the same (y,m,d)
    // endpoints in 360_day span 61
    val src = (0L to 59L)
    val out = CFDecode.dateRangeLike(src, "standard", "360_day", 2001)
    assert(out === (0L to 60L))
  }

  test("date_range_like: same calendar returns the source; 2YS walks the grid") {
    val src = Seq(5L, 6L, 7L)
    assert(CFDecode.dateRangeLike(src, "noleap", "noleap", 2000) eq src)
    assert(CFDecode.dateRangeLike(Seq(0L, 730L, 1460L), "noleap", "360_day",
      2000) === Seq(0L, 720L, 1440L))
  }
}
