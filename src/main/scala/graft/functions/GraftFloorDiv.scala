package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** DuckDB's `//` operator with its 1.0 type dispatch (probed):
  *
  *   7 // 2                  → 3      (truncating integer division)
  *   7.5 // 2, 7 // 2.5      → 3.75, 2.8  (plain DOUBLE division!)
  *   DECIMAL // anything     → DOUBLE division, even at scale 0
  *
  * Spark's `div` keyword parses straight to IntegralDivide (bypassing the
  * function registry) and silently truncates DECIMAL operands — the
  * silent-divergence class. The engine's SQL path routes IntegralDivide
  * through this marker at parse time (graftbridge.ParsedSql); the
  * replacement dispatches on the RESOLVED operand types, which neither the
  * text layer nor an optimizer rule can do (the optimizer runs after types
  * are fixed, and LONG→DOUBLE would corrupt the resolved tree above). */
case class GraftFloorDiv(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)

  private def fractional(dt: DataType): Boolean = dt match {
    case DoubleType | FloatType | _: DecimalType => true
    case _ => false
  }

  // TRY semantics: DuckDB's `x // 0` is NULL at every type (probed —
  // including DOUBLE, where 7.5 // 0 is NULL, not Infinity), the same
  // NULL-on-zero parity ParsedSql gives `/` and `%`. NOTE the TryEval
  // wrapper is load-bearing: EvalMode.TRY alone still THROWS at
  // DivModLike.eval — Spark's own try_divide is TryEval-wrapped too.
  private val tryCtx = NumericEvalContext(EvalMode.TRY)

  override lazy val replacement: Expression =
    if (fractional(left.dataType) || fractional(right.dataType))
      TryEval(Divide(Cast(left, DoubleType), Cast(right, DoubleType), tryCtx))
    else
      // built post-analysis, so the type coercion the analyzer would have
      // inserted is spelled out: IntegralDivide wants same-type operands
      TryEval(IntegralDivide(Cast(left, LongType), Cast(right, LongType), tryCtx))
}
