package graft.functions

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.objects.StaticInvoke
import org.apache.spark.sql.catalyst.trees.{BinaryLike, UnaryLike}
import org.apache.spark.sql.types.{DoubleType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Static kernels for DuckDB functions with no Spark builtin (wave 3c of
  * the probe grid): gcd/lcm (greatest_common_divisor /
  * least_common_multiple) and NFC normalization. Exposed through
  * StaticInvoke so the calls stay inside whole-stage codegen. */
object MathStringFns {
  @scala.annotation.tailrec
  def gcd(a: Long, b: Long): Long =
    if (b == 0L) math.abs(a) else gcd(b, a % b)

  def lcm(a: Long, b: Long): Long =
    if (a == 0L || b == 0L) 0L else math.abs(a / gcd(a, b) * b)

  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))
}

case class GraftGcd(left: Expression, right: Expression, lcm: Boolean)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, LongType,
      if (lcm) "lcm" else "gcd",
      Seq(Cast(left, LongType), Cast(right, LongType)),
      Seq(LongType, LongType), returnNullable = false)
}

case class GraftNfcNormalize(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, StringType, "nfc",
      Seq(Cast(child, StringType)), Seq(StringType))
}
