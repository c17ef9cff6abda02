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
  *   - MAP: LIST-valued, DuckDB 1.0 semantics (round 13) — `m['k']` /
  *     `element_at(m, k)` / `map_extract(m, k)` all return a
  *     single-element list `[v]` when the key is present (including
  *     `[NULL]` for a present NULL value) and the EMPTY list when the key
  *     is missing, the key is NULL, or the map itself is NULL (all three
  *     probed on duckdb 1.0.0). The guarded ElementAt only evaluates on
  *     the present branch, so ANSI's missing-key error path is never
  *     taken.
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
    case _: StructType => idx match {
      // struct bracket access s['field'] is SCALAR in DuckDB (only MAP
      // brackets are list-valued); resolved case-insensitively like the
      // engine's column resolution
      case Literal(s, _: StringType) if s != null =>
        ExtractValue(e, Literal(s.toString),
          org.apache.spark.sql.catalyst.analysis.caseInsensitiveResolution)
      case other => throw new IllegalArgumentException(
        s"struct bracket access needs a string-literal field name, got $other")
    }
    case _: ArrayType => ElementAt(e, Cast(idx, IntegerType))
    case m: MapType =>
      val key = Cast(idx, m.keyType)
      val out = ArrayType(m.valueType, containsNull = true)
      // null-safe presence test: ArrayContains is NULL for a NULL map or
      // NULL key — both are "miss" (empty list) in DuckDB
      val present = Coalesce(Seq(
        ArrayContains(MapKeys(e), key), Literal(false)))
      If(present,
        CreateArray(Seq(ElementAt(e, key))),
        Literal(new org.apache.spark.sql.catalyst.util.GenericArrayData(
          Array.empty[Any]), out))
    case other => throw new IllegalArgumentException(
      s"index brackets need a STRING, ARRAY or MAP operand, got ${other.simpleString}")
  }
}
