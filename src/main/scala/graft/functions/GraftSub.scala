package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** Interval comparisons DuckDB supports but Spark cannot resolve —
  * CalendarIntervalType is not orderable, and YM/DT cannot widen — are
  * rewritten to an exact normalized three-way compare
  * ([[IntervalPartFns.calCompare]]: duckdb's normalize-entries shape —
  * days/30 and micros/30 d carry into months, remaining micros/1 d into
  * days, no re-carry, lexicographic triple compare; probed
  * '1 month' = '30 days' but '31 days' > '24 days 168 hours').
  * Same-family ANSI comparisons stay on Spark's native (equivalent)
  * ordering, so pushdown is untouched. */
object IntervalCompareRule
    extends org.apache.spark.sql.catalyst.rules.Rule[
      org.apache.spark.sql.catalyst.plans.logical.LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

  private def iv(dt: DataType): Boolean = dt match {
    case CalendarIntervalType | _: DayTimeIntervalType |
        _: YearMonthIntervalType => true
    case _ => false
  }

  private def needs(l: Expression, r: Expression): Boolean =
    l.resolved && r.resolved && iv(l.dataType) && iv(r.dataType) && {
      val cross = (l.dataType, r.dataType) match {
        case (_: YearMonthIntervalType, _: DayTimeIntervalType) => true
        case (_: DayTimeIntervalType, _: YearMonthIntervalType) => true
        case _ => false
      }
      l.dataType == CalendarIntervalType ||
        r.dataType == CalendarIntervalType || cross
    }

  private def cmpCall(l: Expression, r: Expression): Expression =
    StaticInvoke(IntervalPartFns.getClass, IntegerType, "calCompare",
      Seq(IntervalWiden.toCal(l), IntervalWiden.toCal(r)),
      Seq(CalendarIntervalType, CalendarIntervalType))

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      // IS [NOT] DISTINCT FROM: calCompare propagates NULL, so the bare
      // rewrite would turn NULL <=> NULL into (NULL <=> 0) = false.
      // Preserve null-safe semantics explicitly: both-null → true,
      // one-null → false (inner <=> sees a NULL compare result).
      case EqualNullSafe(l, r) if needs(l, r) =>
        Or(And(IsNull(l), IsNull(r)),
          EqualNullSafe(cmpCall(l, r), Literal(0)))
      case c: BinaryComparison if needs(c.left, c.right) =>
        c.withNewChildren(Seq(cmpCall(c.left, c.right), Literal(0)))
          .asInstanceOf[Expression]
    }
}

/** Shared by [[GraftSub]]/[[GraftAdd]]: widen any interval flavor to the
  * three-component CalendarInterval for cross-family arithmetic. */
private[functions] object IntervalWiden {
  def toCal(e: Expression): Expression = e.dataType match {
    case CalendarIntervalType => e
    case _: YearMonthIntervalType =>
      StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType,
        "ymToCal", Seq(e), Seq(e.dataType))
    case it: DayTimeIntervalType =>
      StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType,
        "dtToCal", Seq(e, Literal(it.startField == DayTimeIntervalType.DAY)),
        Seq(it, BooleanType))
    case other => throw new IllegalArgumentException(
      s"not an interval: ${other.catalogString}")
  }
}

/** DuckDB's infix `-` with its probed type dispatch. The one semantic
  * divergence from Spark is DATE − DATE: BIGINT days in DuckDB
  * (`DATE '2024-03-01' - DATE '2024-02-01'` → 29), an INTERVAL in Spark —
  * a resolved-type dispatch the text layer cannot do and the optimizer
  * must not (it would change the plan schema), so the engine's SQL path
  * routes every parsed Subtract through this marker at parse time
  * (graftbridge.ParsedSql), the same pattern as `//`→graft_fdiv and
  * CAST(…AS BOOLEAN)→graft_cast_bool.
  *
  * All other combinations reproduce the dispatch Spark's analyzer
  * (ResolveBinaryArithmetic + numeric type coercion) would have applied —
  * spelled out here because a RuntimeReplaceable's replacement tree is
  * never revisited by analyzer coercion. DuckDB result types probed:
  * DATE − integral → DATE; DATE − INTERVAL → TIMESTAMP (DuckDB, where
  * Spark keeps DATE — the TIMESTAMP shape is emitted for parity);
  * TIMESTAMP − TIMESTAMP → INTERVAL (Spark agrees).
  */
case class GraftSub(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def anyInterval(dt: DataType): Boolean = dt match {
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
        CalendarIntervalType => true
    case _ => false
  }

  /** ts − ts: SubtractTimestamps is TimeZoneAware — the replacement is
    * never visited by ResolveTimeZone, so the zone binds here. */
  private def subTs(l: Expression, r: Expression): Expression =
    SubtractTimestamps(l, r,
      org.apache.spark.sql.internal.SQLConf.get.legacyIntervalEnabled, tz)

  /** ts − interval, dispatched on the interval flavor. */
  private def tsMinusInterval(ts: Expression, iv: Expression): Expression =
    iv.dataType match {
      case _: YearMonthIntervalType =>
        TimestampAddYMInterval(ts, UnaryMinus(iv), tz)
      case _ =>
        TimestampAddInterval(ts, UnaryMinus(iv), tz)
    }

  override lazy val replacement: Expression =
    (left.dataType, right.dataType) match {
      // THE divergence this marker exists for: BIGINT day count
      case (DateType, DateType) =>
        Cast(DateDiff(left, right), LongType)
      case (DateType, ByteType | ShortType | IntegerType | LongType) =>
        DateSub(left, Cast(right, IntegerType))
      // DuckDB: DATE − INTERVAL is a TIMESTAMP (midnight-anchored)
      case (DateType, r) if anyInterval(r) =>
        tsMinusInterval(Cast(left, TimestampType, tz), right)
      case (l, r) if isTs(l) && anyInterval(r) =>
        tsMinusInterval(left, right)
      case (l, r) if isTs(l) && isTs(r) =>
        subTs(left, right)
      case (l, DateType) if isTs(l) =>
        subTs(left, Cast(right, l, tz))
      case (DateType, r) if isTs(r) =>
        subTs(Cast(left, r, tz), right)
      // DT − DT where either side carries a DAY component: DuckDB keeps
      // the day/time split component-wise ('1 day' − '26 hours' extracts
      // day 1 / hour −26; ts-diff sums keep hours ≥ 24) — Spark's
      // single-micros DT canonicalizes the split away, so widen to the
      // three-component CalendarInterval (probed, round 15)
      case (l: DayTimeIntervalType, r: DayTimeIntervalType)
          if l.startField == DayTimeIntervalType.DAY ||
            r.startField == DayTimeIntervalType.DAY =>
        StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType,
          "subCal",
          Seq(IntervalWiden.toCal(left), IntervalWiden.toCal(right)),
          Seq(CalendarIntervalType, CalendarIntervalType))
      // interval − interval / numeric − numeric / NULL: widen to the
      // common type (the coercion the analyzer would insert) and keep
      // Spark's Subtract — decimal result precision is computed by
      // BinaryArithmetic itself in Spark 4
      case (l, r) =>
        // Spark coerces a STRING operand in arithmetic to DOUBLE
        def arith(dt: DataType): DataType =
          if (dt == StringType) DoubleType else dt
        TypeCoercion.findWiderTypeForTwo(arith(l), arith(r)) match {
          case Some(common) =>
            Subtract(Cast(left, common, tz), Cast(right, common, tz))
          // cross-family interval arithmetic (YM − DT, Calendar − ANSI):
          // DuckDB subtracts intervals of any unit freely — widen both to
          // CalendarInterval and subtract component-wise
          case None if anyInterval(l) && anyInterval(r) =>
            StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType,
              "subCal",
              Seq(IntervalWiden.toCal(left), IntervalWiden.toCal(right)),
              Seq(CalendarIntervalType, CalendarIntervalType))
          case None => throw new IllegalArgumentException(
            s"cannot subtract ${r.catalogString} from ${l.catalogString}")
        }
    }
}

/** DuckDB's infix `+`, the [[GraftSub]] mirror (round 14). The semantic
  * divergence: DATE + INTERVAL is a midnight-anchored TIMESTAMP in DuckDB
  * (probed: `DATE '2024-01-31' + INTERVAL 1 MONTH` → TIMESTAMP
  * `2024-02-29 00:00:00`) where Spark keeps DATE for YM intervals.
  * DATE ± integral stays DATE on both. Everything else reproduces the
  * analyzer's own dispatch — the replacement tree is never revisited by
  * coercion, so the widening is spelled out. */
case class GraftAdd(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  private def tz: Option[String] =
    Some(org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone)

  private def isTs(dt: DataType): Boolean =
    dt == TimestampType || dt == TimestampNTZType

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  private def anyInterval(dt: DataType): Boolean = dt match {
    case _: DayTimeIntervalType | _: YearMonthIntervalType |
        CalendarIntervalType => true
    case _ => false
  }

  private def tsPlusInterval(ts: Expression, iv: Expression): Expression =
    iv.dataType match {
      case _: YearMonthIntervalType => TimestampAddYMInterval(ts, iv, tz)
      case _ => TimestampAddInterval(ts, iv, tz)
    }

  override lazy val replacement: Expression =
    (left.dataType, right.dataType) match {
      case (DateType, r) if isIntegral(r) =>
        DateAdd(left, Cast(right, IntegerType))
      case (l, DateType) if isIntegral(l) =>
        DateAdd(right, Cast(left, IntegerType))
      // THE divergence this marker exists for: DATE + INTERVAL is a
      // TIMESTAMP in DuckDB (midnight-anchored)
      case (DateType, r) if anyInterval(r) =>
        tsPlusInterval(Cast(left, TimestampType, tz), right)
      case (l, DateType) if anyInterval(l) =>
        tsPlusInterval(Cast(right, TimestampType, tz), left)
      case (l, r) if isTs(l) && anyInterval(r) => tsPlusInterval(left, right)
      case (l, r) if anyInterval(l) && isTs(r) => tsPlusInterval(right, left)
      // DT + DT with a DAY component on either side: component-wise, the
      // GraftSub mirror (probed: INTERVAL 400 DAYS + INTERVAL 26 HOURS
      // extracts day 400 / hour 26 — never day 401 / hour 2)
      case (l: DayTimeIntervalType, r: DayTimeIntervalType)
          if l.startField == DayTimeIntervalType.DAY ||
            r.startField == DayTimeIntervalType.DAY =>
        StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType,
          "addCal",
          Seq(IntervalWiden.toCal(left), IntervalWiden.toCal(right)),
          Seq(CalendarIntervalType, CalendarIntervalType))
      case (l, r) =>
        def arith(dt: DataType): DataType =
          if (dt == StringType) DoubleType else dt
        TypeCoercion.findWiderTypeForTwo(arith(l), arith(r)) match {
          case Some(common) =>
            Add(Cast(left, common, tz), Cast(right, common, tz))
          // cross-family interval arithmetic (YM + DT, Calendar + ANSI):
          // DuckDB adds intervals of any unit freely — widen both to
          // CalendarInterval and add component-wise
          case None if anyInterval(l) && anyInterval(r) =>
            StaticInvoke(IntervalPartFns.getClass, CalendarIntervalType,
              "addCal",
              Seq(IntervalWiden.toCal(left), IntervalWiden.toCal(right)),
              Seq(CalendarIntervalType, CalendarIntervalType))
          case None => throw new IllegalArgumentException(
            s"cannot add ${l.catalogString} and ${r.catalogString}")
        }
    }
}
