package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.{CalendarInterval, UTF8String}

/** DuckDB `date_part`/`extract` over INTERVAL values.
  *
  * DuckDB (Postgres-style) intervals hold three INDEPENDENT components —
  * months, days, microseconds — and extraction reads each component's own
  * arithmetic (all probed on duckdb 1.0.0 this round):
  *
  *   - months: year = months/12, month = months%12, quarter =
  *     month/3 + 1, decade/century/millennium = months/120/1200/12000 —
  *     every division TRUNCATES toward zero (year of −14 months = −1,
  *     decade of −25 years = −2);
  *   - days: day = the component, never rolled into months;
  *   - micros: hour = micros/1h UNBOUNDED (26 hours → 26 — hours never
  *     roll into days), minute = (micros%1h)/1min, second/millisecond/
  *     microsecond read within the MINUTE (ms of 1.5 s = 1500), second
  *     truncates to BIGINT (1.5 s → 1);
  *   - epoch: DOUBLE total seconds with months converted as WHOLE years
  *     at 365.25 days plus remainder months at 30 days (epoch of
  *     14 months = 1y·365.25d + 2mo·30d = 36 741 600 — NOT a flat
  *     30.4375 d/month, which would give 36 817 200; see monthsEpoch);
  *   - any other field (dow, week, doy, era, isoyear, …) is a LOUD
  *     "interval units not recognized" error.
  *
  * Spark's ANSI intervals canonicalize instead: a DayTimeIntervalType is
  * one micros value. The DAY/time split is recovered from the TYPE's
  * start field — a literal or a timestamp difference with a DAY start
  * keeps its time-of-day under 24 h (the ANSI literal constraint /
  * DuckDB's own ts−ts normalization, probed: day 4 hour 2 for a 4d2h
  * difference), so day = micros/86400e6 is exact there, while HOUR-or-
  * finer intervals have no day component at all (day of 26 HOUR = 0,
  * hour = 26). The one unrepresentable corner: a multi-unit literal
  * whose time part exceeds 24 h ('400 days 26 hours') — Spark's type
  * canonicalizes it away; DuckDB keeps day = 400, hour = 26 (documented
  * boundary, COVERAGE.md). CalendarIntervalType (make_interval) carries
  * all three components, so it extracts with full parity.
  *
  * Non-interval sources delegate to Spark's own
  * [[DatePart.parseExtractField]] — except `epoch`, which Spark lacks:
  * seconds since 1970 as DOUBLE via unix_micros (what the former dialect
  * text rewrite emitted; moved here so INTERVAL epochs dispatch too).
  *
  * Reference surface: duckdb date_part/extract over INTERVAL
  * (wasm exposes them through RunQuery). Routed at parse time by
  * graftbridge.ParsedSql (the graft_sub pattern).
  */
object IntervalPartFns {
  private val MicrosMin = 60000000L
  private val MicrosHour = 3600000000L
  private val MicrosDay = 86400000000L

  /** DuckDB's accepted interval unit spellings → canonical field. */
  private val canonical: Map[String, String] = {
    def m(c: String, sp: String*) = sp.map(_ -> c)
    (m("year", "year", "years", "yr", "yrs", "y") ++
      m("month", "month", "months", "mon", "mons") ++
      m("day", "day", "days", "d") ++
      m("hour", "hour", "hours", "hr", "hrs", "h") ++
      m("minute", "minute", "minutes", "min", "mins", "m") ++
      m("second", "second", "seconds", "sec", "secs", "s") ++
      m("millisecond", "millisecond", "milliseconds", "ms", "msec", "msecs") ++
      m("microsecond", "microsecond", "microseconds", "us", "usec", "usecs") ++
      m("quarter", "quarter", "quarters") ++
      m("decade", "decade", "decades", "dec", "decs") ++
      m("century", "century", "centuries", "cent", "c") ++
      m("millennium", "millennium", "millenniums", "millennia", "mil", "mils") ++
      m("epoch", "epoch")).toMap
  }

  def canon(field: String): String =
    canonical.getOrElse(field.toLowerCase,
      throw new IllegalArgumentException(
        s"""Not implemented Error: interval units "$field" not recognized"""))

  private def fromComponents(f: String, months: Long, days: Long,
      micros: Long): Long = f match {
    case "year" => months / 12
    case "month" => months % 12
    case "quarter" => (months % 12) / 3 + 1
    case "decade" => months / 120
    case "century" => months / 1200
    case "millennium" => months / 12000
    case "day" => days
    case "hour" => micros / MicrosHour
    case "minute" => (micros % MicrosHour) / MicrosMin
    case "second" => (micros % MicrosMin) / 1000000L
    case "millisecond" => (micros % MicrosMin) / 1000L
    case "microsecond" => micros % MicrosMin
  }

  def ymPart(field: UTF8String, months: Int): Long =
    fromComponents(canon(field.toString), months.toLong, 0L, 0L)

  def dtPart(field: UTF8String, micros: Long, startsAtDay: Boolean): Long = {
    val (days, rem) =
      if (startsAtDay) (micros / MicrosDay, micros % MicrosDay)
      else (0L, micros)
    fromComponents(canon(field.toString), 0L, days, rem)
  }

  def calPart(field: UTF8String, iv: CalendarInterval): Long =
    fromComponents(canon(field.toString), iv.months.toLong, iv.days.toLong,
      iv.microseconds)

  /** epoch over intervals: DOUBLE total seconds. Months are NOT linear
    * (probed): whole years count 365.25 days (epoch(12 months) =
    * 31 557 600), the month remainder counts 30 days (epoch(1 month) =
    * 2 592 000; epoch(14 months) = 31 557 600 + 2·2 592 000); days count
    * 86 400; negative months mirror via truncating division. */
  private def monthsEpoch(months: Long): Double =
    (months / 12) * 31557600.0 + (months % 12) * 2592000.0
  def ymEpoch(months: Int): Double = monthsEpoch(months.toLong)
  def dtEpoch(micros: Long): Double = micros / 1e6
  def calEpoch(iv: CalendarInterval): Double =
    monthsEpoch(iv.months.toLong) + iv.days * 86400.0 +
      iv.microseconds / 1e6

  /** Widening ANSI intervals to the three-component CalendarInterval —
    * DuckDB adds/subtracts intervals of ANY unit family freely
    * (INTERVAL 1 MONTH + INTERVAL 1 DAY), where Spark's ANSI types can't
    * widen across families. A DAY-starting interval keeps its day
    * component separate (the dtPart convention) so extraction parity
    * survives the arithmetic. */
  def ymToCal(months: Int): CalendarInterval =
    new CalendarInterval(months, 0, 0)
  def dtToCal(micros: Long, startsAtDay: Boolean): CalendarInterval =
    if (startsAtDay)
      new CalendarInterval(0, (micros / MicrosDay).toInt, micros % MicrosDay)
    else new CalendarInterval(0, 0, micros)
  def addCal(a: CalendarInterval, b: CalendarInterval): CalendarInterval =
    new CalendarInterval(Math.addExact(a.months, b.months),
      Math.addExact(a.days, b.days),
      Math.addExact(a.microseconds, b.microseconds))
  def subCal(a: CalendarInterval, b: CalendarInterval): CalendarInterval =
    new CalendarInterval(Math.subtractExact(a.months, b.months),
      Math.subtractExact(a.days, b.days),
      Math.subtractExact(a.microseconds, b.microseconds))

  /** Interval COMPARISON normalization — duckdb's normalize-entries
    * shape, pinned by a 25-case probe matrix (round 15): each side's
    * days/30 and micros/(30 d) carry into MONTHS, the remaining
    * micros/(1 d) carry into DAYS — and the carried days do NOT re-carry
    * into months — then the (months, days, micros) triples compare
    * lexicographically. This is NOT a flat total ('31 days' normalizes
    * to (1 mo, 1 d) but '24 days 168 hours' to (0 mo, 31 d), so
    * '31 days' > '24 days 168 hours' despite equal flat hours — probed),
    * though it agrees with the flat total whenever micros stay under
    * 24 h. All divisions truncate toward zero (negative mirror probed:
    * '-1 month' < '-29 days'). */
  def calCompare(a: CalendarInterval, b: CalendarInterval): Int = {
    val MicrosMonth = 30L * MicrosDay
    def norm(iv: CalendarInterval): (Long, Long, Long) = {
      val m = iv.months.toLong + iv.days / 30 +
        iv.microseconds / MicrosMonth
      val usRem = iv.microseconds % MicrosMonth
      (m, iv.days % 30 + usRem / MicrosDay, usRem % MicrosDay)
    }
    val (am, ad, au) = norm(a)
    val (bm, bd, bu) = norm(b)
    if (am != bm) java.lang.Long.compare(am, bm)
    else if (ad != bd) java.lang.Long.compare(ad, bd)
    else java.lang.Long.compare(au, bu)
  }

  /** DuckDB/Postgres `age(end, start)`: the SYMBOLIC calendar difference
    * as a three-component interval — component-wise year/month/day/time
    * diffs with borrow cascades, day borrows taking the length of the
    * EARLIER timestamp's month and advancing it per borrow (the Postgres
    * timestamp_age algorithm; pinned on five probed cases incl. both
    * month-end clamps and the negative mirror). */
  def agePG(endMicros: Long, startMicros: Long, zone: UTF8String)
      : CalendarInterval = {
    if (endMicros < startMicros) {
      val p = agePG(startMicros, endMicros, zone)
      return new CalendarInterval(-p.months, -p.days, -p.microseconds)
    }
    val zid = java.time.ZoneId.of(zone.toString)
    def ldt(m: Long) = java.time.LocalDateTime.ofInstant(
      java.time.Instant.ofEpochSecond(
        Math.floorDiv(m, 1000000L), Math.floorMod(m, 1000000L) * 1000L), zid)
    val e = ldt(endMicros)
    val s = ldt(startMicros)
    var micros =
      (e.toLocalTime.toNanoOfDay - s.toLocalTime.toNanoOfDay) / 1000L
    var day = e.getDayOfMonth - s.getDayOfMonth
    var month = e.getMonthValue - s.getMonthValue
    var year = e.getYear - s.getYear
    if (micros < 0) { micros += MicrosDay; day -= 1 }
    var anchor = java.time.YearMonth.of(s.getYear, s.getMonthValue)
    while (day < 0) {
      day += anchor.lengthOfMonth()
      month -= 1
      anchor = anchor.plusMonths(1)
    }
    while (month < 0) { month += 12; year -= 1 }
    new CalendarInterval(year * 12 + month, day, micros)
  }
}

/** `age(end, start)` — see [[IntervalPartFns.agePG]]; the result is a
  * CalendarInterval, so date_part/extract over it reads the components
  * with full parity ([[IntervalPartFns.calPart]]). */
case class GraftAge(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override lazy val replacement: Expression = {
    val zone = org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone
    StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType, "agePG",
      Seq(Cast(left, TimestampType, Some(zone)),
        Cast(right, TimestampType, Some(zone)), Literal(zone)),
      Seq(TimestampType, TimestampType, StringType))
  }
}

/** `date_part(field, e)` / `extract(field FROM e)` with DuckDB's interval
  * semantics — see [[IntervalPartFns]]. Non-intervals keep Spark's own
  * dispatch; `epoch` is DOUBLE seconds since 1970 at every source type. */
case class GraftDatePart(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  override lazy val replacement: Expression = {
    val f = left match {
      case Literal(s, _: StringType) if s != null => s.toString
      case other => throw new IllegalArgumentException(
        s"date_part field must be a string literal, got ${other.sql}")
    }
    def part(kind: String, dt: DataType, extra: Seq[Expression] = Nil,
        extraT: Seq[DataType] = Nil): Expression =
      if (IntervalPartFns.canon(f) == "epoch")
        StaticInvoke(IntervalPartFns.getClass, DoubleType, s"${kind}Epoch",
          Seq(right), Seq(dt))
      else
        StaticInvoke(IntervalPartFns.getClass, LongType, s"${kind}Part",
          Literal(f) +: right +: extra, StringType +: dt +: extraT)
    right.dataType match {
      case it: YearMonthIntervalType => part("ym", it)
      case it: DayTimeIntervalType =>
        part("dt", it,
          Seq(Literal(it.startField == DayTimeIntervalType.DAY)),
          Seq(BooleanType))
      case CalendarIntervalType => part("cal", CalendarIntervalType)
      case _ if f.equalsIgnoreCase("epoch") =>
        // seconds since 1970 as DOUBLE (Spark has no EPOCH field) — the
        // former dialect text rewrite, moved here so interval sources
        // dispatch to the component kernels above instead
        Divide(
          Cast(UnixMicros(Cast(right, TimestampType, tz)), DoubleType),
          Literal(1000000.0), EvalMode.LEGACY)
      case _ if Set("century", "centuries", "cent", "c", "decade",
          "decades", "dec", "decs", "millennium", "millenniums",
          "millennia", "mil", "mils")(f.toLowerCase) =>
        // Spark's DatePart has no century/decade/millennium fields;
        // DuckDB (probed): century = ⌈year/100⌉ (2001 → 21), decade =
        // ⌊year/10⌋ (1987 → 198), millennium = ⌈year/1000⌉ — matching
        // the function-spelling rewrites in DialectFunctions
        val yr = Cast(Year(Cast(right, DateType, tz)), DoubleType)
        val (span, ceilF) = f.toLowerCase.head match {
          case 'c' => (100.0, true)
          case 'd' => (10.0, false)
          case _ => (1000.0, true)
        }
        val q = Divide(yr, Literal(span), EvalMode.LEGACY)
        Cast(if (ceilF) Ceil(q) else Floor(q), LongType)
      case _ =>
        // Spark's own field dispatch — but a replacement tree is never
        // visited by the analyzer, so the two analysis-time services its
        // expressions rely on are applied here (the GraftSub /
        // GraftDateTrunc discipline): implicit input casts (year(ts)
        // needs ts→date; the coercion flavor follows the session's ANSI
        // mode like ImplicitTypeCasts does) and the session time zone on
        // TimeZoneAware nodes (Hour/Minute/Second/…).
        val coercion =
          if (org.apache.spark.sql.internal.SQLConf.get.ansiEnabled)
            org.apache.spark.sql.catalyst.analysis.AnsiTypeCoercion
          else org.apache.spark.sql.catalyst.analysis.TypeCoercion
        DatePart.parseExtractField(f, right).transformUp {
          case e: ImplicitCastInputTypes
              if !e.resolved && e.childrenResolved &&
                e.children.length == e.inputTypes.length =>
            e.withNewChildren(e.children.zip(e.inputTypes).map {
              case (c, t) => coercion.implicitCast(c, t).getOrElse(c)
            })
        }.transformUp {
          case tza: TimeZoneAwareExpression if tza.timeZoneId.isEmpty =>
            tza.withTimeZone(
              org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)
        }
    }
  }
}
