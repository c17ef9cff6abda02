package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCoercion
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

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
      case (l, r) =>
        def arith(dt: DataType): DataType =
          if (dt == StringType) DoubleType else dt
        TypeCoercion.findWiderTypeForTwo(arith(l), arith(r)) match {
          case Some(common) =>
            Add(Cast(left, common, tz), Cast(right, common, tz))
          case None => throw new IllegalArgumentException(
            s"cannot add ${l.catalogString} and ${r.catalogString}")
        }
    }
}
