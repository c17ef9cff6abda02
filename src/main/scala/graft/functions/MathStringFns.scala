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
    if (b == 0L) {
      // abs(Long.MinValue) wraps negative; DuckDB errors loudly instead
      if (a == Long.MinValue) throw new ArithmeticException(
        "Out of Range Error: Overflow on abs(-9223372036854775808)")
      math.abs(a)
    } else gcd(b, a % b)

  def lcm(a: Long, b: Long): Long =
    if (a == 0L || b == 0L) 0L
    else {
      // DuckDB's BIGINT lcm errors on overflow rather than wrapping
      val m =
        try Math.multiplyExact(a / gcd(a, b), b)
        catch { case _: ArithmeticException => throw new ArithmeticException(
          "Out of Range Error: lcm value is out of range") }
      if (m == Long.MinValue) throw new ArithmeticException(
        "Out of Range Error: lcm value is out of range")
      math.abs(m)
    }

  def nfc(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFC))

  /** DuckDB chr(n): the UTF-8 character of a CODEPOINT (Spark's chr is
    * ASCII-only — chr(9731) silently returns '' where DuckDB gives ☃;
    * round-14 probe grid). Invalid codepoints error loudly like DuckDB. */
  def chrCodepoint(n: Long): UTF8String = {
    // Surrogates (U+D800–U+DFFF) pass isValidCodePoint but encode as no
    // valid UTF-8 scalar — DuckDB rejects them loudly; so do we.
    if (n < 0 || n > Character.MAX_CODE_POINT || !Character.isValidCodePoint(n.toInt) ||
        (n >= 0xD800 && n <= 0xDFFF))
      throw new IllegalArgumentException(
        s"Invalid Input Error: Invalid UTF8 Codepoint of value $n")
    UTF8String.fromString(new String(Character.toChars(n.toInt)))
  }

  /** DuckDB strip_accents: NFD-decompose and drop combining marks. */
  def stripAccents(s: UTF8String): UTF8String =
    if (s == null) null
    else UTF8String.fromString(java.text.Normalizer.normalize(
      s.toString, java.text.Normalizer.Form.NFD)
      .replaceAll("\\p{M}+", ""))

  /** DuckDB bar(x, min, max, width): Unicode block bar. Semantics pinned
    * by probe (round 14): fraction clamped to [0,1], units =
    * TRUNC(fraction · width · 8) eighth-blocks (bar(5.99,0,6,6) is five
    * fulls + ▉, not six fulls), partial glyph = U+2590 − remainder, and
    * the result is space-padded while its UTF-8 BYTE length is under
    * width — a byte-vs-glyph quirk DuckDB itself exhibits (bar(0.9,0,6,6)
    * = '▉   ': 3 bytes of ▉ + 3 spaces). */
  def bar(x: Double, lo: Double, hi: Double, width: Double): UTF8String = {
    val f0 = (x - lo) / (hi - lo)
    val fraction = if (f0.isNaN) 0.0 else math.max(0.0, math.min(1.0, f0))
    val units = (fraction * (width * 8).toLong).toLong
    val sb = new java.lang.StringBuilder
    var i = 0L
    while (i < units / 8) { sb.append('█'); i += 1 }
    val rem = (units % 8).toInt
    if (rem > 0) sb.append((0x2590 - rem).toChar)
    var bytes = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8).length
    while (bytes < width.toLong) { sb.append(' '); bytes += 1 }
    UTF8String.fromString(sb.toString)
  }

  /** IEEE 754 sign bit — exact for −0.0 and negative NaN payloads. */
  def signbit(d: Double): Boolean = java.lang.Double.doubleToRawLongBits(d) < 0

  def nextafter(a: Double, b: Double): Double = Math.nextAfter(a, b)

  /** The unscaled value of a DECIMAL as a double — DuckDB's own wide-
    * decimal quantile arithmetic (hugeint unscaled → double, probed: the
    * p>18 interpolation rounds exactly like a BigInteger→double cast). */
  def unscaledDouble(d: org.apache.spark.sql.types.Decimal): Double =
    d.toJavaBigDecimal.unscaledValue.doubleValue

  /** Truncate an unscaled double TOWARD ZERO and re-scale — the inverse of
    * [[unscaledDouble]] for results wider than a long. */
  def decimalFromUnscaledDouble(x: Double, precision: Int, scale: Int)
      : org.apache.spark.sql.types.Decimal =
    org.apache.spark.sql.types.Decimal(
      BigDecimal(new java.math.BigDecimal(x)
        .setScale(0, java.math.RoundingMode.DOWN)
        .movePointLeft(scale)), precision, scale)

  /** Codepoint-wise SIMPLE case mapping, matching DuckDB's utf8proc:
    * never length-changing (upper('ﬁ') stays 'ﬁ', lower('ΑΣ') is 'ασ' with
    * a plain sigma — probed), unlike the JVM's String.toUpperCase full
    * mapping (ß→SS). The one codepoint where utf8proc and Java's simple
    * tables disagree (probed over the SpecialCasing.txt inventory):
    * ß → U+1E9E ẞ, which Unicode leaves unmapped but utf8proc maps. */
  def upperSimple(s: UTF8String): UTF8String = mapCase(s, upper = true)
  def lowerSimple(s: UTF8String): UTF8String = mapCase(s, upper = false)

  private def mapCase(s: UTF8String, upper: Boolean): UTF8String = {
    if (s == null) return null
    val str = s.toString
    // ASCII fast path: the simple and full mappings agree on ASCII, and
    // the codepoint loop measurably costs on token streams (q80 at sf10:
    // +0.24 s from lower() over every document token before this check)
    var ascii = true
    var k = 0
    while (ascii && k < str.length) {
      if (str.charAt(k) >= 0x80) ascii = false
      k += 1
    }
    if (ascii)
      return UTF8String.fromString(
        if (upper) str.toUpperCase(java.util.Locale.ROOT)
        else str.toLowerCase(java.util.Locale.ROOT))
    val sb = new java.lang.StringBuilder(str.length)
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      val m =
        if (upper) { if (cp == 0xDF) 0x1E9E else Character.toUpperCase(cp) }
        else Character.toLowerCase(cp)
      sb.appendCodePoint(m)
      i += Character.charCount(cp)
    }
    UTF8String.fromString(sb.toString)
  }
}

/** upper()/lower() with utf8proc's simple (non-length-changing) mapping. */
case class GraftCaseMap(child: Expression, upper: Boolean)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, StringType,
      if (upper) "upperSimple" else "lowerSimple",
      Seq(Cast(child, StringType)), Seq(StringType))
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

/** DuckDB chr(codepoint) — see [[MathStringFns.chrCodepoint]]. */
case class GraftChr(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, StringType, "chrCodepoint",
      Seq(Cast(child, LongType)), Seq(LongType))
}

/** DuckDB strip_accents — see [[MathStringFns.stripAccents]]. */
case class GraftStripAccents(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, StringType, "stripAccents",
      Seq(Cast(child, StringType)), Seq(StringType))
}

/** DuckDB bar() — see [[MathStringFns.bar]]. */
case class GraftBar(children: Seq[Expression]) extends RuntimeReplaceable {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, StringType, "bar",
      children.map(Cast(_, DoubleType)),
      Seq.fill(children.length)(DoubleType))
}

/** IEEE sign bit — see [[MathStringFns.signbit]]. */
case class GraftSignbit(child: Expression)
    extends RuntimeReplaceable with UnaryLike[Expression] {
  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass,
      org.apache.spark.sql.types.BooleanType, "signbit",
      Seq(Cast(child, DoubleType)), Seq(DoubleType))
}

/** Math.nextAfter — see [[MathStringFns.nextafter]]. */
case class GraftNextAfter(left: Expression, right: Expression)
    extends RuntimeReplaceable with BinaryLike[Expression] {
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
  override lazy val replacement: Expression =
    StaticInvoke(MathStringFns.getClass, DoubleType, "nextafter",
      Seq(Cast(left, DoubleType), Cast(right, DoubleType)),
      Seq(DoubleType, DoubleType))
}

/** printf/format with DECIMAL arguments: DuckDB's %f accepts its DECIMAL
  * literals (2.5 parses as DECIMAL(2,1)) where Spark's format_string
  * throws IllegalFormatConversion — the marker casts DECIMAL arguments
  * to DOUBLE and delegates to FormatString (round-14 probe grid). */
case class GraftPrintf(children: Seq[Expression]) extends RuntimeReplaceable {
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): Expression =
    copy(children = newChildren)
  override lazy val replacement: Expression =
    FormatString(children.head +: children.tail.map { a =>
      a.dataType match {
        case _: org.apache.spark.sql.types.DecimalType => Cast(a, DoubleType)
        case _ => a
      }
    }: _*)
}
