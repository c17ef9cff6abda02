package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.UnaryLike
import org.apache.spark.sql.types._

/** DuckDB's numeric→integer CAST ROUNDS where Spark's truncates — and the
  * rounding mode depends on the SOURCE type (pinned empirically on 1.0):
  *
  *   - DOUBLE/FLOAT → int: round HALF-EVEN (2.5→2, 3.5→4, -2.5→-2) —
  *     C's rint, Spark's `rint`;
  *   - DECIMAL → int: round HALF-AWAY (2.5→3, -2.5→-3) — Spark's
  *     Round(x, 0) (BigDecimal HALF_UP = away from zero);
  *   - VARCHAR → int: parsed as a decimal, then HALF-AWAY ('2.5'→3,
  *     '-2.5'→-3); unparseable strings yield NULL here (non-ANSI Cast)
  *     where DuckDB errors — the session's standing loud-vs-NULL
  *     divergence class, same as 1/0;
  *   - everything else (integrals, booleans, dates): plain Cast.
  *
  * The dialect layer rewrites `CAST(e AS INT)` / `e::INT` to this
  * expression; the type dispatch must happen after resolution, which SQL
  * text cannot do. */
case class GraftIntCast(child: Expression, to: DataType)
    extends RuntimeReplaceable with UnaryLike[Expression] {

  override lazy val replacement: Expression = child.dataType match {
    case DoubleType | FloatType =>
      Cast(Rint(Cast(child, DoubleType)), to)
    case _: DecimalType =>
      Cast(Round(child, Literal(0)), to)
    case _: StringType =>
      Cast(Round(Cast(child, DecimalType(38, 15)), Literal(0)), to)
    case _ => Cast(child, to)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
