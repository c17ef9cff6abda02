package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.trees.BinaryLike
import org.apache.spark.sql.types._

/** DuckDB single-bracket extraction `e[i]` — type-dispatched after
  * resolution (text can't):
  *
  *   - STRING: the i-th character, 1-based, negatives from the end,
  *     out-of-range (incl. 0) yields the EMPTY string — exactly the
  *     one-element slice, so the tree reuses [[GraftSlice]]'s clamp math
  *     (pinned empirically on DuckDB 1.0: 'hello'[2]='e', [0]='',
  *     [-1]='o', [99]='');
  *   - ARRAY: ElementAt — 1-based with negative from-the-end indexes,
  *     NULL out of range (non-ANSI), matching DuckDB's list extract
  *     (index 0 errors in Spark where DuckDB yields NULL — loud, and
  *     identical to the previous element_at emission);
  *   - MAP: ElementAt with the key cast to the map's key type (the
  *     implicit cast the SQL-text form used to get).
  */
case class GraftExtract(e: Expression, idx: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {

  override def left: Expression = e
  override def right: Expression = idx

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(e = newLeft, idx = newRight)

  override lazy val replacement: Expression = e.dataType match {
    case _: StringType => GraftSlice(e, idx, idx).replacement
    case _: ArrayType => ElementAt(e, Cast(idx, IntegerType))
    case m: MapType => ElementAt(e, Cast(idx, m.keyType))
    case other => throw new IllegalArgumentException(
      s"index brackets need a STRING, ARRAY or MAP operand, got ${other.simpleString}")
  }
}
