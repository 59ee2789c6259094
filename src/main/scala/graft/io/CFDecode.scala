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

  /** Floor division paired with `pmod`: Spark's `/` on longs truncates
    * toward zero, so negative days-since-epoch would decode to a year one
    * too high while pmod floors the remainder — an inconsistent date.
    * (d - pmod(d, n)) / n floors for all signs. */
  private def floorDiv(d: Column, n: Long): Column =
    (d - pmod(d, lit(n))) / n

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
    val year = floorDiv(days.cast("long"), 365L).cast("int") + epochYear
    val doy = pmod(days.cast("long"), lit(365L)).cast("int") // 0-based
    // both chains key on doy (see monthDay: an mStart-over-month chain
    // is O(144) copies of doy and overflows generated methods)
    val (month, day) = monthDay(doy, monthStartsNoLeap)
    struct(year.as("year"), month.as("month"),
      day.as("day"), (doy + 1).as("doy"))
  }

  /** Encode (year, month, day) noleap fields back to days since epoch.
    * NULL for month outside 1-12 (see [[monthStartOf]]). */
  def noleapEncode(year: Column, month: Column, day: Column, epochYear: Int): Column =
    (year - epochYear).cast("long") * 365L +
      monthStartOf(month, monthStartsNoLeap) + day.cast("long") - 1L

  /** Cumulative month start for a 1-12 month column by ARRAY INDEXING, not
    * a when-chain: a 12-branch chain evaluates `month` 12 times, and when
    * `month` is itself a decode when-chain the textual composition squares
    * (the round-16 interpreted-fallback finding — encode(decode(d)) blew
    * generated methods past janino's 64 KB). `get` references `month`
    * exactly once and yields NULL out of range (callers guard validity via
    * [[calendarValid]], whose CaseWhen evaluates lazily). */
  private def monthStartOf(month: Column, starts: Seq[Int]): Column =
    get(array(starts.dropRight(1).map(lit): _*), month - 1)

  // --- full cftime calendar family (ref `coding/times.py:535` cftime
  // decode path; `coding/cftime_offsets.py` calendar arithmetic;
  // `core/dataset.py:10011` convert_calendar). Same representation as
  // noleap: a (year, month, day, doy) struct computed from integer
  // days-since-epoch with pure column arithmetic, no UDF — at 100 TB the
  // decode rides inside the scan's codegen stage. ---

  private[graft] val monthStartsAllLeap = Seq(0, 31, 60, 91, 121, 152, 182,
    213, 244, 274, 305, 335, 366)

  /** (month, day) from a 0-based day-of-year given cumulative month
    * starts, via FOLDABLE per-day lookup arrays — not when-chains. A
    * 12-branch chain evaluates `doy` 12 times and generates O(months)
    * code per consumer; composed encode(decode(d)) expressions then blow
    * generated aggregate methods past janino's 64 KB limit and Spark
    * silently falls back to interpreted execution (the round-16 verdict
    * finding). `array(lit...)` of constants folds to ONE constant-array
    * reference in generated code, so the lookup is O(1) code AND O(1)
    * per-row work regardless of calendar complexity. */
  private def monthDay(doy: Column, starts: Seq[Int]): (Column, Column) = {
    val monthOfDay = (0 until starts.last).map(d => starts.indexWhere(_ > d))
    val startOfDay = (0 until starts.last).map(d => starts(starts.indexWhere(_ > d) - 1))
    (get(array(monthOfDay.map(lit): _*), doy),
      doy - get(array(startOfDay.map(lit): _*), doy) + 1)
  }

  /** 360_day calendar decode: every month is exactly 30 days. */
  def cal360Decode(days: Column, epochYear: Int): Column = {
    val d = days.cast("long")
    val year = floorDiv(d, 360L).cast("int") + epochYear
    val doy = pmod(d, lit(360L)).cast("int")
    struct(year.as("year"), ((doy / 30).cast("int") + 1).as("month"),
      (pmod(doy, lit(30)) + 1).as("day"), (doy + 1).as("doy"))
  }

  /** 360_day encode back to days since epoch. */
  def cal360Encode(year: Column, month: Column, day: Column, epochYear: Int): Column =
    (year - epochYear).cast("long") * 360L + (month - 1).cast("long") * 30L +
      day.cast("long") - 1L

  /** all_leap (366_day) calendar decode: every year has a Feb 29. */
  def allLeapDecode(days: Column, epochYear: Int): Column = {
    val d = days.cast("long")
    val year = floorDiv(d, 366L).cast("int") + epochYear
    val doy = pmod(d, lit(366L)).cast("int")
    val (month, day) = monthDay(doy, monthStartsAllLeap)
    struct(year.as("year"), month.as("month"), day.as("day"), (doy + 1).as("doy"))
  }

  /** all_leap encode back to days since epoch. */
  def allLeapEncode(year: Column, month: Column, day: Column, epochYear: Int): Column =
    (year - epochYear).cast("long") * 366L +
      monthStartOf(month, monthStartsAllLeap) + day.cast("long") - 1L

  /** julian calendar decode: leap every 4 years, no century rule, so time
    * is periodic in 1461-day cycles. `epochYear` must be a julian leap year
    * (divisible by 4) so each cycle starts with its leap year. */
  def julianDecode(days: Column, epochYear: Int): Column = {
    require(epochYear % 4 == 0, "julian epochYear must be divisible by 4")
    val d = days.cast("long")
    val cycle = floorDiv(d, 1461L).cast("long")
    val rem = pmod(d, lit(1461L)).cast("int")
    // foldable per-rem lookups over the whole 1461-day cycle (leap year
    // first) — see monthDay for why lookups, not when-chains
    val yearStarts = Seq(0, 366, 731, 1096)
    val yicArr = (0 until 1461).map(r => yearStarts.lastIndexWhere(_ <= r))
    val doyArr = (0 until 1461).map(r => r - yearStarts(yicArr(r)))
    def startsOf(r: Int) =
      if (yicArr(r) == 0) monthStartsAllLeap else monthStartsNoLeap
    val monthArr = (0 until 1461).map(r => startsOf(r).indexWhere(_ > doyArr(r)))
    val dayArr = (0 until 1461).map(r =>
      doyArr(r) - startsOf(r)(monthArr(r) - 1) + 1)
    val year = (cycle * 4L).cast("int") +
      get(array(yicArr.map(lit): _*), rem) + epochYear
    struct(year.as("year"),
      get(array(monthArr.map(lit): _*), rem).as("month"),
      get(array(dayArr.map(lit): _*), rem).as("day"),
      (get(array(doyArr.map(lit): _*), rem) + 1).as("doy"))
  }

  /** julian encode back to days since epoch (epochYear divisible by 4). */
  def julianEncode(year: Column, month: Column, day: Column, epochYear: Int): Column = {
    require(epochYear % 4 == 0, "julian epochYear must be divisible by 4")
    val yrs = (year - epochYear).cast("long")
    val cycles = floorDiv(yrs, 4L).cast("long")
    val yic = pmod(yrs, lit(4L)).cast("int")
    val yStart = when(yic === 0, 0L).when(yic === 1, 366L).when(yic === 2, 731L)
      .otherwise(1096L)
    // one combined 24-slot array indexed by (leap? 0 : 12) + month keeps
    // the `month` expression to a single textual occurrence
    val starts24 = (monthStartsAllLeap.dropRight(1) ++
      monthStartsNoLeap.dropRight(1)).map(lit)
    val mStart = get(array(starts24: _*),
      when(yic === 0, lit(0)).otherwise(lit(12)) + month - 1)
    cycles * 1461L + yStart + mStart.cast("long") + day.cast("long") - 1L
  }

  /** proleptic_gregorian decode: Spark's DateType IS the proleptic
    * Gregorian calendar (Proleptic since 3.0 / Java 8 time), so the
    * decode is native date arithmetic — date_add from the epoch, then
    * field extraction. Codegen'd, no CASE chains. */
  def prolepticDecode(days: Column, epochYear: Int): Column = {
    val dt = date_add(make_date(lit(epochYear), lit(1), lit(1)),
      days.cast("int"))
    struct(year(dt).as("year"), month(dt).as("month"),
      dayofmonth(dt).as("day"), dayofyear(dt).as("doy"))
  }

  /** proleptic_gregorian encode back to days since epoch. */
  def prolepticEncode(y: Column, m: Column, d: Column,
                      epochYear: Int): Column =
    datediff(make_date(y, m, d),
      make_date(lit(epochYear), lit(1), lit(1))).cast("long")

  /** Is (y, m, d) a real date in the proleptic-gregorian calendar? */
  def gregorianValid(y: Column, m: Column, d: Column): Column = {
    val leap = (pmod(y, lit(4)) === 0 && pmod(y, lit(100)) =!= 0) ||
      pmod(y, lit(400)) === 0
    val len = when(m.isin(1, 3, 5, 7, 8, 10, 12), 31)
      .when(m.isin(4, 6, 9, 11), 30)
      .otherwise(when(leap, 29).otherwise(28))
    d >= 1 && d <= len
  }

  /** convert_calendar to "standard": dates that don't exist in gregorian
    * (Feb 29 of a julian-only leap year, day 30 of a 360_day February, ...)
    * become NULL — the reference's `missing=None` drop semantics
    * (`core/dataset.py:10011`). CaseWhen evaluates lazily, so ANSI
    * make_date never sees an invalid triple. */
  def toStandardDate(y: Column, m: Column, d: Column): Column =
    when(gregorianValid(y, m, d), make_date(y, m, d))

  /** Is (y, m, d) a real date in `calendar`? */
  def calendarValid(calendar: String, y: Column, m: Column, d: Column): Column = {
    // array indexing, not a when-chain — see monthStartOf
    def lenFrom(starts: Seq[Int]): Column =
      get(array(starts.sliding(2).map(b => lit(b(1) - b.head)).toSeq: _*),
        m - 1)
    calendar match {
      case "proleptic_gregorian" | "standard" | "gregorian" =>
        return gregorianValid(y, m, d) && m >= 1 && m <= 12
      case _ => ()
    }
    val len = calendar match {
      case "360_day"  => lit(30)
      case "noleap"   => lenFrom(monthStartsNoLeap)
      case "all_leap" => lenFrom(monthStartsAllLeap)
      case "julian" =>
        when(pmod(y, lit(4)) === 0, lenFrom(monthStartsAllLeap))
          .otherwise(lenFrom(monthStartsNoLeap))
    }
    d >= 1 && d <= len && m >= 1 && m <= 12
  }

  /** Generic convert_calendar (ref `core/dataset.py:10011`): re-encode a
    * (year, month, day) from ANY source calendar as days-since-epoch in
    * `target`, NULL for dates the target lacks (drop semantics). The date
    * keeps its (y, m, d) identity, exactly like the reference. */
  def convertCalendar(y: Column, m: Column, d: Column, target: String,
                      epochYear: Int): Column = {
    val enc = target match {
      case "360_day"  => cal360Encode(y, m, d, epochYear)
      case "noleap"   => noleapEncode(y, m, d, epochYear)
      case "all_leap" => allLeapEncode(y, m, d, epochYear)
      case "julian"   => julianEncode(y, m, d, epochYear)
      case "proleptic_gregorian" | "standard" | "gregorian" =>
        prolepticEncode(y, m, d, epochYear)
    }
    when(calendarValid(target, y, m, d), enc)
  }

  /** Full pipeline: mask then scale/offset (the coder order the reference
    * applies on open). */
  def decode(c: Column, fillValue: Any, scale: Double, offset: Double): Column =
    scaleOffsetDecode(maskDecode(c, fillValue), scale, offset)

  /** open_dataset(decode_cf=True): apply the CF coders to every data
    * variable that declares them in varAttrs (_FillValue / missing_value,
    * scale_factor, add_offset) — the attr-driven dispatch of
    * `conventions.py:109` decode_cf_variable. One projection; variables
    * without CF attrs pass through untouched. */
  def decodeDataset(ds: graft.model.XDataset): graft.model.XDataset = {
    val decodedDf = ds.dataVars.foldLeft(ds.df) { (df, v) =>
      val attrs = ds.meta.varAttrs.getOrElse(v, Map.empty)
      val fill = attrs.get("_FillValue").orElse(attrs.get("missing_value"))
      val scale = attrs.get("scale_factor").map(_.toDouble)
      val offset = attrs.get("add_offset").map(_.toDouble)
      if (fill.isEmpty && scale.isEmpty && offset.isEmpty) df
      else {
        val masked = fill.map(f => maskDecode(col(v), f.toDouble))
          .getOrElse(col(v))
        val decoded =
          if (scale.isDefined || offset.isDefined)
            scaleOffsetDecode(masked, scale.getOrElse(1.0), offset.getOrElse(0.0))
          else masked
        df.withColumn(v, decoded)
      }
    }
    new graft.model.XDataset(decodedDf, ds.meta)
  }

  // --- calendar-aware date_range (ref `coding/cftime_offsets.py:1221`
  // cftime_range). Driver-side day-count generation: the result is a small
  // probe/axis grid that broadcasts with the plan, like timeBuckets. ---

  /** Day-counts since epoch for `n` consecutive days. */
  def cftimeRangeDays(startDay: Long, n: Int): Seq[Long] =
    startDay until (startDay + n)

  /** Day count since epoch of the START of (year, month0) in `calendar`
    * (month0 is 0-based). The single anchor every offset frequency below
    * derives from. */
  private def monthStartDay(calendar: String, epochYear: Int,
                            year: Int, month0: Int): Long = calendar match {
    case "360_day"  => (year - epochYear).toLong * 360L + month0 * 30L
    case "noleap"   => (year - epochYear).toLong * 365L +
      monthStartsNoLeap(month0)
    case "all_leap" => (year - epochYear).toLong * 366L +
      monthStartsAllLeap(month0)
    case "julian" =>
      require(epochYear % 4 == 0, "julian epochYear must be divisible by 4")
      val yrs = year - epochYear
      val cycles = Math.floorDiv(yrs, 4)
      val yic = Math.floorMod(yrs, 4)
      cycles.toLong * 1461L + Seq(0L, 366L, 731L, 1096L)(yic) +
        (if (yic == 0) monthStartsAllLeap(month0)
         else monthStartsNoLeap(month0))
    case "proleptic_gregorian" | "standard" | "gregorian" =>
      java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.of(epochYear, 1, 1),
        java.time.LocalDate.of(year, month0 + 1, 1))
    case c => sys.error(s"unknown calendar $c")
  }

  /** Calendar-aware date_range over the cftime offset family (ref
    * `coding/cftime_offsets.py` Day/MonthBegin/MonthEnd/QuarterBegin/
    * QuarterEnd/YearBegin/YearEnd, `:1221` cftime_range): day counts
    * since epoch of `periods` ticks from January 1 of `startYear`.
    * Driver-side generation — the result is a small axis/probe grid that
    * broadcasts with the plan. Anchored frequencies:
    * D, MS, ME, QS (Jan anchor), QE, YS, YE, and n-multiples like "3D". */
  def cftimeRange(calendar: String, epochYear: Int, startYear: Int,
                  periods: Int, freq: String): Seq[Long] = {
    val (n, unit) = {
      val m = "^(\\d*)([A-Z]+)$".r.findFirstMatchIn(freq)
        .getOrElse(sys.error(s"unparseable freq $freq"))
      (if (m.group(1).isEmpty) 1 else m.group(1).toInt, m.group(2))
    }
    require(n > 0, s"freq multiple must be positive: $freq")
    def ms(k: Int): Long = // start of the k-th month from startYear-01
      monthStartDay(calendar, epochYear, startYear + Math.floorDiv(k, 12),
        Math.floorMod(k, 12))
    (0 until periods).map { i =>
      val k = i * n
      unit match {
        case "D"  => ms(0) + k
        case "MS" => ms(k)
        case "ME" => ms(k + 1) - 1 // last day of month k
        case "QS" => ms(k * 3)
        case "QE" => ms(k * 3 + 3) - 1
        case "YS" => ms(k * 12)
        case "YE" => ms(k * 12 + 12) - 1
        case u => sys.error(s"unsupported freq $u (D/MS/ME/QS/QE/YS/YE)")
      }
    }
  }

  /** Day-counts of `months` consecutive month STARTS (freq="MS") from
    * January of `startYear`, in the given calendar. */
  def cftimeRangeMonthStarts(calendar: String, epochYear: Int,
                             startYear: Int, months: Int): Seq[Long] = {
    require(calendar != "julian" || epochYear % 4 == 0,
      "julian epochYear must be divisible by 4")
    def startsFor(leap: Boolean): Seq[Int] =
      if (leap) monthStartsAllLeap else monthStartsNoLeap
    (0 until months).map { k =>
      val y = startYear + k / 12
      val m = k % 12
      calendar match {
        case "360_day"  => (y - epochYear).toLong * 360L + m * 30L
        case "noleap"   => (y - epochYear).toLong * 365L + monthStartsNoLeap(m)
        case "all_leap" => (y - epochYear).toLong * 366L + monthStartsAllLeap(m)
        case "julian" =>
          val yrs = y - epochYear
          val cycles = yrs / 4
          val yic = yrs % 4
          cycles.toLong * 1461L + Seq(0L, 366L, 731L, 1096L)(yic) +
            startsFor(yic == 0)(m)
      }
    }
  }

  // --- date_range_like (ref `coding/cftime_offsets.py:1553`): a range
  // with the same start, end, and inferred frequency as a source axis,
  // re-expressed in a different calendar. Driver-side like cftimeRange —
  // the result is an axis grid that broadcasts with the plan, never data.

  /** Scalar (year, month 1-12, day 1-31) of a day count since January 1
    * of `epochYear` — the driver-side mirror of the column decoders above,
    * for axis generation. */
  private[graft] def ymdOfDay(calendar: String, epochYear: Int,
                              day: Long): (Int, Int, Int) = {
    def fromDoy(y: Int, doy: Int, starts: Seq[Int]): (Int, Int, Int) = {
      val m0 = starts.indexWhere(_ > doy) - 1
      (y, m0 + 1, doy - starts(m0) + 1)
    }
    calendar match {
      case "360_day" =>
        val doy = Math.floorMod(day, 360L).toInt
        (Math.floorDiv(day, 360L).toInt + epochYear, doy / 30 + 1, doy % 30 + 1)
      case "noleap" =>
        fromDoy(Math.floorDiv(day, 365L).toInt + epochYear,
          Math.floorMod(day, 365L).toInt, monthStartsNoLeap)
      case "all_leap" =>
        fromDoy(Math.floorDiv(day, 366L).toInt + epochYear,
          Math.floorMod(day, 366L).toInt, monthStartsAllLeap)
      case "julian" =>
        require(epochYear % 4 == 0, "julian epochYear must be divisible by 4")
        val cyc = Math.floorDiv(day, 1461L)
        val dic = Math.floorMod(day, 1461L).toInt // day in the 4-year cycle
        val yearStarts = Seq(0, 366, 731, 1096, 1461)
        val yic = yearStarts.indexWhere(_ > dic) - 1
        fromDoy(epochYear + cyc.toInt * 4 + yic, dic - yearStarts(yic),
          if (yic == 0) monthStartsAllLeap else monthStartsNoLeap)
      case "proleptic_gregorian" | "standard" | "gregorian" =>
        val d = java.time.LocalDate.of(epochYear, 1, 1).plusDays(day)
        (d.getYear, d.getMonthValue, d.getDayOfMonth)
      case c => sys.error(s"unknown calendar $c")
    }
  }

  /** Days in (year, month 1-12) of `calendar`. */
  private[graft] def daysInMonthCal(calendar: String, year: Int,
                                    month: Int): Int = calendar match {
    case "360_day"  => 30
    case "noleap"   => monthStartsNoLeap(month) - monthStartsNoLeap(month - 1)
    case "all_leap" => monthStartsAllLeap(month) - monthStartsAllLeap(month - 1)
    case "julian" =>
      val s = if (year % 4 == 0) monthStartsAllLeap else monthStartsNoLeap
      s(month) - s(month - 1)
    case "proleptic_gregorian" | "standard" | "gregorian" =>
      java.time.LocalDate.of(year, month, 1).lengthOfMonth
    case c => sys.error(s"unknown calendar $c")
  }

  /** Day count since epoch of (year, month 1-12, day 1-31) in `calendar`
    * — scalar inverse of [[ymdOfDay]]. */
  def dayOfYmd(calendar: String, epochYear: Int,
               year: Int, month: Int, day: Int): Long =
    monthStartDay(calendar, epochYear, year, month - 1) + day - 1L

  /** Day count of the LAST day of (year, month 1-12) in `calendar`. */
  def monthEndDay(calendar: String, epochYear: Int,
                  year: Int, month: Int): Long =
    dayOfYmd(calendar, epochYear, year, month,
      daysInMonthCal(calendar, year, month))

  /** infer_freq over a day-count axis (ref `coding/frequencies.py:34`
    * `_CFTimeFrequencyInferer.get_freq`, mirroring pandas): month-anchored
    * rules are checked BEFORE constant day spacing — a 360_day month-end
    * series is "ME", not "30D" — because the two convert differently
    * across calendars. Subset: D / MS / ME / QS (Jan/Apr/Jul/Oct) /
    * QE (Mar/Jun/Sep/Dec) / YS (Jan) / YE (Dec) and n-multiples. */
  def inferFreqDays(calendar: String, epochYear: Int,
                    days: Seq[Long]): Option[String] = {
    if (days.length < 3 || days.sliding(2).exists(p => p(1) <= p(0)))
      return None
    def multi(n: Int, u: String) = Some(if (n == 1) u else s"$n$u")
    val ymds = days.map(ymdOfDay(calendar, epochYear, _))
    val mIdx = ymds.map { case (y, m, _) => (y - epochYear) * 12 + (m - 1) }
    val mDeltas = mIdx.sliding(2).map(p => p(1) - p(0)).toSeq
    val monthly =
      if (mDeltas.distinct.size == 1 && mDeltas.head > 0) {
        val k = mDeltas.head
        val m0 = ymds.head._2
        if (ymds.forall(_._3 == 1)) {
          if (k % 12 == 0 && m0 == 1) multi(k / 12, "YS")
          else if (k % 3 == 0 && Set(1, 4, 7, 10)(m0)) multi(k / 3, "QS")
          else multi(k, "MS")
        } else if (ymds.forall { case (y, m, d) =>
            d == daysInMonthCal(calendar, y, m) }) {
          if (k % 12 == 0 && m0 == 12) multi(k / 12, "YE")
          else if (k % 3 == 0 && Set(3, 6, 9, 12)(m0)) multi(k / 3, "QE")
          else multi(k, "ME")
        } else None
      } else None
    monthly.orElse {
      val deltas = days.sliding(2).map(p => p(1) - p(0)).toSeq
      if (deltas.distinct.size == 1) multi(deltas.head.toInt, "D") else None
    }
  }

  /** date_range_like (ref `coding/cftime_offsets.py:1553`): day counts
    * with the same start, end, and inferred frequency as `sourceDays` (in
    * `sourceCal`), in `targetCal`. Start/end keep their (y, m, d)
    * identity, clamped back to the target month's last day when shorter
    * (the reference's "try 1 and 2 calendar days before"); a source
    * ending on its month's last day keeps ending on the TARGET month's
    * last day for D/ME/QE/YE (the reference's end-of-month special case).
    * Month-anchored ticks walk the anchored month grid, so e.g. a noleap
    * Feb 28 month-end maps to Feb 29 in a leap year. Same `epochYear`
    * convention on both sides. */
  def dateRangeLike(sourceDays: Seq[Long], sourceCal: String,
                    targetCal: String, epochYear: Int): Seq[Long] = {
    require(sourceDays.nonEmpty, "date_range_like: empty source axis")
    if (targetCal == sourceCal) return sourceDays
    val freq = inferFreqDays(sourceCal, epochYear, sourceDays).getOrElse(
      sys.error("date_range_like: source frequency was not inferable"))
    val (n, unit) = {
      val m = "^(\\d*)([A-Z]+)$".r.findFirstMatchIn(freq).get
      (if (m.group(1).isEmpty) 1 else m.group(1).toInt, m.group(2))
    }
    val (ys, ms, ds) = ymdOfDay(sourceCal, epochYear, sourceDays.head)
    val (ye, me, de) = ymdOfDay(sourceCal, epochYear, sourceDays.last)
    def clamp(y: Int, m: Int, d: Int): Int =
      math.min(d, daysInMonthCal(targetCal, y, m))
    val dEnd =
      if (de == daysInMonthCal(sourceCal, ye, me) &&
          Set("D", "ME", "QE", "YE")(unit))
        daysInMonthCal(targetCal, ye, me)
      else clamp(ye, me, de)
    val startDay = dayOfYmd(targetCal, epochYear, ys, ms, clamp(ys, ms, ds))
    val endDay = dayOfYmd(targetCal, epochYear, ye, me, dEnd)
    unit match {
      case "D" => (startDay to endDay by n.toLong)
      case _ =>
        val monthsPer = unit match {
          case "MS" | "ME" => n
          case "QS" | "QE" => 3 * n
          case "YS" | "YE" => 12 * n
        }
        val isEnd = unit.endsWith("E")
        val k0 = (ys - epochYear) * 12 + (ms - 1)
        def msAt(k: Int): Long = monthStartDay(targetCal, epochYear,
          epochYear + Math.floorDiv(k, 12), Math.floorMod(k, 12))
        Iterator.from(0)
          .map(i => if (isEnd) msAt(k0 + i * monthsPer + 1) - 1L
                    else msAt(k0 + i * monthsPer))
          .takeWhile(_ <= endDay)
          .dropWhile(_ < startDay)
          .toSeq
    }
  }
}
