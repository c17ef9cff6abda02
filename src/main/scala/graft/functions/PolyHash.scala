package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Shared runtime kernel for [[PolyHash]] — a `while`-loop fold over the
  * string's Unicode code points. Kept in an object (static forwarder) so the
  * generated code calls it directly without reflection. */
object HashKernels {
  def polyHash(s: UTF8String, mult: Long, mod: Long): Long = {
    val str = s.toString
    var acc = 0L
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      acc = (acc * mult + cp) % mod
      i += Character.charCount(cp)
    }
    acc
  }
}

/** Polynomial rolling hash over a string's Unicode code points:
  * `acc = (acc * mult + codepoint) mod modP`, starting at 0.
  *
  * Unlike xxhash64/murmur3 this hash is *portable*: any SQL engine with
  * per-character access expresses it exactly (DuckDB:
  * `list_reduce(list_prepend(0, list_transform(regexp_split_to_array(s, ''),
  * c -> ascii(c))), (a, c) -> (a * mult + c) % modP)`), which is what lets
  * every dedup/fingerprint/multimodal pipeline query carry a bit-exact
  * DuckDB oracle instead of a rows-only check. `mult`/`modP` are
  * compile-time constants; with modP = 2^31−1 the accumulator stays far from
  * Long overflow (acc·mult + cp < 2^62) under ANSI mode.
  */
case class PolyHash(child: Expression, mult: Long, modP: Long)
    extends UnaryExpression {

  require(modP > 0 && mult > 0 && modP <= (1L << 31) && mult <= (1L << 31),
    "poly hash constants must fit 31 bits to stay overflow-safe")

  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case StringType => org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"graft_polyhash needs STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any =
    HashKernels.polyHash(input.asInstanceOf[UTF8String], mult, modP)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.HashKernels.polyHash($s, ${mult}L, ${modP}L);")

  override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
}
