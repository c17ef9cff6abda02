package graft.dialect

import scala.math.BigDecimal.RoundingMode

/** DuckDB multi-unit INTERVAL literals → `make_interval(...)`.
  *
  * DuckDB (Postgres-style) interval values hold three INDEPENDENT
  * components — months, days, microseconds — and a multi-unit literal
  * keeps them separate: `INTERVAL '400 days 26 hours'` extracts day 400 /
  * hour 26, and `INTERVAL '1 month 5 days'` mixes families freely. Spark's
  * ANSI interval literals canonicalize at parse (the 26 hours roll into
  * days) and refuse to mix year-month with day-time units, so the engine
  * path rewrites the multi-unit form to `make_interval`, whose
  * CalendarIntervalType carries all three components with full extraction
  * parity (functions/GraftDatePart).
  *
  * Semantics pinned by probe on duckdb 1.0 (round 15):
  *   - unit values may be signed and FRACTIONAL; fractions spill downward
  *     after summing per component: month fraction → ×30 days, day/week
  *     fraction → ×86 400 s ('1.5 months' = 1 mo 15 d, '1.5 weeks' =
  *     10 d 12 h), year/quarter/… fractions are exact in months when
  *     ×12/×3 lands whole, else spill like months;
  *   - spill is order-independent ('0.5 months 15 days' ≡
  *     '15 days 0.5 months' = 30 days);
  *   - sub-second totals TRUNCATE toward zero at micros ('1.9999996
  *     seconds' = 1.999999 s);
  *   - a bare `hh:mm[:ss[.f]]` token is a time part ('1 day 01:30:00' =
  *     day 1, hour 1, minute 30);
  *   - quarter/decade/century/millennium are accepted unit spellings
  *     (centuries = 1200 months, …).
  *
  * Single-unit integer literals ('3 days', '26 hours') keep Spark's ANSI
  * types — their extraction is already pinned (GraftDatePart dtPart) and
  * ANSI intervals stay comparable/sortable natively. ANSI-form literals
  * with a trailing unit keyword (`INTERVAL '4' DAY`, `'1-2' YEAR TO
  * MONTH`) are untouched.
  *
  * Reference surface: duckdb interval literal binding through RunQuery
  * (wasm); semantics from duckdb's interval.cpp multi-unit parser —
  * behavior pinned by probe, implementation independent.
  */
object IntervalLiteral {

  private val LiteralRe = java.util.regex.Pattern.compile(
    """(?i)\bINTERVAL\s*'([^']*)'(\s*(?:YEAR|QUARTER|MONTH|WEEK|DAY|HOUR|MINUTE|SECOND|MILLISECOND|MICROSECOND)S?\b)?""")

  /** One `<signed number> <unit>` group or a bare `hh:mm[:ss[.f]]` tail. */
  private val GroupRe = java.util.regex.Pattern.compile(
    """(?i)\G\s*(?:([+-]?\d+(?:\.\d+)?)\s*([a-z]+)|([+-]?)(\d+):(\d{1,2})(?::(\d{1,2}(?:\.\d+)?))?)""")

  private val MonthsPerUnit: Map[String, Int] = Map(
    "millennium" -> 12000, "millenniums" -> 12000, "millennia" -> 12000,
    "mil" -> 12000, "mils" -> 12000,
    "century" -> 1200, "centuries" -> 1200, "cent" -> 1200, "c" -> 1200,
    "decade" -> 120, "decades" -> 120, "dec" -> 120, "decs" -> 120,
    "year" -> 12, "years" -> 12, "yr" -> 12, "yrs" -> 12, "y" -> 12,
    "quarter" -> 3, "quarters" -> 3,
    "month" -> 1, "months" -> 1, "mon" -> 1, "mons" -> 1)

  private val DaysPerUnit: Map[String, Int] = Map(
    "week" -> 7, "weeks" -> 7, "w" -> 7,
    "day" -> 1, "days" -> 1, "d" -> 1)

  private val SecsPerUnit: Map[String, BigDecimal] = Map(
    "hour" -> BigDecimal(3600), "hours" -> BigDecimal(3600),
    "hr" -> BigDecimal(3600), "hrs" -> BigDecimal(3600),
    "h" -> BigDecimal(3600),
    "minute" -> BigDecimal(60), "minutes" -> BigDecimal(60),
    "min" -> BigDecimal(60), "mins" -> BigDecimal(60),
    "m" -> BigDecimal(60),
    "second" -> BigDecimal(1), "seconds" -> BigDecimal(1),
    "sec" -> BigDecimal(1), "secs" -> BigDecimal(1), "s" -> BigDecimal(1),
    "millisecond" -> BigDecimal("0.001"), "milliseconds" -> BigDecimal("0.001"),
    "ms" -> BigDecimal("0.001"), "msec" -> BigDecimal("0.001"),
    "msecs" -> BigDecimal("0.001"),
    "microsecond" -> BigDecimal("0.000001"),
    "microseconds" -> BigDecimal("0.000001"),
    "us" -> BigDecimal("0.000001"), "usec" -> BigDecimal("0.000001"),
    "usecs" -> BigDecimal("0.000001"))

  /** Parse a literal body; None = not our grammar (leave for Spark). */
  private def parse(body: String)
      : Option[(BigDecimal, BigDecimal, BigDecimal, Int, Boolean)] = {
    var months = BigDecimal(0)
    var days = BigDecimal(0)
    var secs = BigDecimal(0)
    var groups = 0
    var fractional = false
    var exotic = false
    val m = GroupRe.matcher(body)
    var end = 0
    while (m.find(end) && m.start == end) {
      if (m.group(1) != null) {
        val v = BigDecimal(m.group(1))
        if (!v.isWhole) fractional = true
        val unit = m.group(2).toLowerCase
        MonthsPerUnit.get(unit) match {
          case Some(k) =>
            months += v * k
            if (k == 3 || k >= 120) exotic = true
          case None => DaysPerUnit.get(unit) match {
            case Some(k) => days += v * k
            case None => SecsPerUnit.get(unit) match {
              case Some(k) => secs += v * k
              case None => return None // unknown unit — not our grammar
            }
          }
        }
      } else {
        // hh:mm[:ss] time tail — the sign applies to the whole token
        val sign = if (m.group(3) == "-") -1 else 1
        secs += sign * (BigDecimal(m.group(4)) * 3600 +
          BigDecimal(m.group(5)) * 60 +
          (if (m.group(6) != null) BigDecimal(m.group(6)) else BigDecimal(0)))
        exotic = true // Spark has no multi-unit time-tail form
      }
      groups += 1
      end = m.end
    }
    if (groups == 0 || body.substring(end).trim.nonEmpty) None
    else Some((months, days, secs, groups, fractional || exotic))
  }

  /** Spill fractions downward and emit the make_interval call text. */
  private def emit(monthsF: BigDecimal, daysF: BigDecimal,
      secsF: BigDecimal): Option[String] = {
    val months = monthsF.setScale(0, RoundingMode.DOWN)
    val days2 = daysF + (monthsF - months) * 30
    val days = days2.setScale(0, RoundingMode.DOWN)
    val secs3 = secsF + (days2 - days) * 86400
    // micros truncate toward zero (probed: '1.9999996 seconds' → 1.999999)
    val secs = secs3.setScale(6, RoundingMode.DOWN)
    if (!months.isValidInt || !days.isValidInt) return None
    Some(s"make_interval(0, ${months.toInt}, 0, ${days.toInt}, 0, 0, " +
      s"${secs.bigDecimal.toPlainString})")
  }

  def rewrite(sql: String): String = {
    if (!sql.toLowerCase.contains("interval")) return sql
    // Match against a literal/comment-masked copy (length-preserving) so
    // an INTERVAL-shaped token sequence starting inside a string constant
    // or a comment can never be rewritten; the literal body is read back
    // from the ORIGINAL text by offset (masking blanks literal insides).
    val masked = SqlText.maskLitsAndComments(sql)
    val m = LiteralRe.matcher(masked)
    val sb = new java.lang.StringBuilder
    var last = 0
    while (m.find()) {
      sb.append(sql, last, m.start)
      val ansiUnit = m.group(2)
      val replaced: Option[String] =
        if (ansiUnit != null) None // ANSI form `INTERVAL '4' DAY` — Spark's
        else parse(sql.substring(m.start(1), m.end(1))) match {
          // single plain integer unit group keeps Spark's ANSI literal
          case Some((mo, d, s, groups, needsCal))
              if groups >= 2 || needsCal => emit(mo, d, s)
          case _ => None
        }
      replaced match {
        case Some(call) =>
          sb.append(call)
          last = m.end
        case None =>
          sb.append(sql, m.start, m.end)
          last = m.end
      }
    }
    sb.append(sql.substring(last))
    sb.toString
  }
}
