package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Characters inside duplicated array elements — the Gopher-style
  * repetition signal's hot kernel (p26): Σ length(x) over elements
  * occurring MORE THAN ONCE in the array.
  *
  * The HOF spelling `aggregate(filter(a, x -> size(filter(a, y -> y = x))
  * > 1), …)` is O(n²) per row AND interpreted (Spark's higher-order
  * functions never enter whole-stage codegen); this kernel is one O(n)
  * hash pass, called from generated code like [[HashKernels.polyHash]].
  * Result is identical by definition — membership in the >1-occurrence
  * set does not depend on how it is computed — so the DuckDB oracle
  * (which keeps the O(n²) list_filter spelling) is untouched. */
object TextKernels {
  def dupChars(arr: ArrayData): Long = {
    val n = arr.numElements()
    val counts = new java.util.HashMap[UTF8String, Integer](n * 2)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val c = counts.get(s)
        counts.put(s, if (c == null) 1 else c + 1)
      }
      i += 1
    }
    var tot = 0L
    i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        if (counts.get(s) > 1) tot += s.numChars() // length() = chars
      }
      i += 1
    }
    tot
  }
}

/** `dup_chars(array<string>) -> bigint`; see [[TextKernels.dupChars]]. */
case class DupChars(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"dup_chars needs array<string>, got $other")
    }

  override def nullSafeEval(a: Any): Any =
    TextKernels.dupChars(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.TextKernels.dupChars($a);")

  override protected def withNewChildInternal(newChild: Expression): DupChars =
    copy(child = newChild)
}
