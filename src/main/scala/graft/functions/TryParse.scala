package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Cast, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Exception-free `TRY_CAST(string AS <integral>)`.
  *
  * Spark's TRY-mode cast routes string→integral through the THROWING parse
  * (`UTF8String.toIntExact` et al.) and catches the `NumberFormatException`
  * per failing row. Exception construction is microseconds per row, so a
  * column of non-numeric strings makes TRY_CAST ~10× slower than the scan
  * around it (measured: 1.75 s of a 1.9 s query at sf0.1 was two TRY_CASTs
  * over 150k rows) — at 100 TB that is the whole job. The exact variants are
  * thin wrappers over the non-throwing `toLong(LongWrapper)`/`toInt(
  * IntWrapper)` grammar (trimmed whitespace, optional sign, digits only,
  * overflow → failure), so parsing through the wrapper API is
  * semantics-identical and never allocates an exception.
  *
  * [[TryParseIntegral]] is that wrapper parse as a codegen expression;
  * [[TryCastParseRule]] swaps it in for every resolved TRY-mode
  * string→integral `Cast` at optimization time (where child types are
  * known — the SQL-text layer cannot see types). TryParseSpec pins parity
  * with `try_cast` on the full probe matrix.
  */
case class TryParseIntegral(child: Expression, override val dataType: DataType)
    extends UnaryExpression {

  require(TryParseIntegral.targets.contains(dataType),
    s"TryParseIntegral supports integral targets only, got $dataType")

  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = child.dataType match {
    case _: StringType =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    case other =>
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"TryParseIntegral needs STRING, got $other")
  }

  override def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[UTF8String]
    dataType match {
      case LongType =>
        val w = new UTF8String.LongWrapper
        if (s.toLong(w)) w.value else null
      case IntegerType =>
        val w = new UTF8String.IntWrapper
        if (s.toInt(w)) w.value else null
      case ShortType =>
        val w = new UTF8String.IntWrapper
        if (s.toShort(w)) w.value.toShort else null
      case ByteType =>
        val w = new UTF8String.IntWrapper
        if (s.toByte(w)) w.value.toByte else null
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val (wrapperCls, parseFun, coerce) = dataType match {
      case LongType => ("org.apache.spark.unsafe.types.UTF8String.LongWrapper", "toLong", "")
      case IntegerType => ("org.apache.spark.unsafe.types.UTF8String.IntWrapper", "toInt", "")
      case ShortType => ("org.apache.spark.unsafe.types.UTF8String.IntWrapper", "toShort", "(short) ")
      case ByteType => ("org.apache.spark.unsafe.types.UTF8String.IntWrapper", "toByte", "(byte) ")
    }
    // one wrapper per expression instance, reused across rows (no per-row
    // allocation; the parse itself is allocation- and exception-free)
    val wrapper = ctx.addMutableState(wrapperCls, "tryParseWrapper",
      v => s"$v = new $wrapperCls();")
    nullSafeCodeGen(ctx, ev, s => s"""
      if ($s.$parseFun($wrapper)) {
        ${ev.value} = $coerce$wrapper.value;
      } else {
        ${ev.isNull} = true;
      }""")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TryParseIntegral {
  val targets: Set[DataType] = Set(LongType, IntegerType, ShortType, ByteType)
}

/** Cheap necessary-condition check for "this string could parse as a
  * number": skip leading control/space bytes (≤ 0x20 — exactly what
  * `String.trim` inside Spark's numeric parsers strips), then test the
  * first significant byte against the characters a successful parse can
  * start with (`[+-.0-9]`, plus `[iInN]` for the floating grammar's
  * inf/nan spellings). A failing check proves the real parser would throw
  * — so the caller can emit NULL without constructing the exception. A
  * passing check proves nothing; the caller falls through to the real
  * parser (exact semantics by construction, exceptions only on
  * digit-leading garbage, which real data rarely has). */
case class NumericParseable(child: Expression, floating: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.BooleanType

  override def nullSafeEval(input: Any): Any =
    NumericParseable.plausible(input.asInstanceOf[UTF8String], floating)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, s =>
      s"${ev.value} = graft.functions.NumericParseable.plausible($s, $floating);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object NumericParseable {
  def plausible(s: UTF8String, floating: Boolean): Boolean = {
    val bytes = s.getBytes
    var i = 0
    while (i < bytes.length && (bytes(i) & 0xff) <= 0x20) i += 1
    if (i == bytes.length) return false
    val b = bytes(i)
    // any non-ASCII lead byte stays plausible: BigDecimal accepts Unicode
    // digits (Character.digit — '٤٢' parses to 42), and multibyte
    // whitespace is not trimmed by the parsers' String.trim; both cases
    // must reach the real parser for exact semantics.
    (b & 0xff) >= 0x80 ||
      (b >= '0' && b <= '9') || b == '+' || b == '-' || b == '.' ||
      (floating && (b == 'i' || b == 'I' || b == 'n' || b == 'N'))
  }
}

/** Optimizer rule: resolved TRY-mode string→integral casts become the
  * exception-free [[TryParseIntegral]]. Runs in the user-rule batch (after
  * the main optimizer), so pushdown/pruning decisions are unaffected.
  * Injected by [[graft.GraftExtensions]] and by `graft.functions
  * .registerAll` (via `spark.experimental.extraOptimizations`), so every
  * engine session gets it.
  *
  * DATE/TIMESTAMP targets are intentionally NOT rewritten: Spark 4.1's
  * string→datetime casts already parse through the Option-returning
  * `DateTimeUtils.stringToDate`/`stringToTimestamp` grammar with no per-row
  * exception on failure (measured on a 4M-row half-garbage probe:
  * all-garbage TRY_CAST-to-DATE 0.17 s ≈ all-valid 0.21 s, while the
  * pre-rule integral path took 4.1 s on the same garbage — exception-
  * dominated). A prototype Option-based datetime rewrite measured ~2×
  * SLOWER than the native path (extra boxing layer over the same parser),
  * so there is nothing to eliminate here. */
object TryCastParseRule extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.expressions.{CaseWhen, EvalMode, If, In, Literal, Lower, TryEval}

  override def apply(plan: LogicalPlan): LogicalPlan =
    plan.transformAllExpressions {
      case c: Cast if c.isTryCast && c.child.resolved &&
          c.child.dataType.isInstanceOf[StringType] &&
          TryParseIntegral.targets.contains(c.dataType) =>
        TryParseIntegral(c.child, c.dataType)

      // decimal/double/float have no exception-free parser in Spark
      // (Decimal.fromString and the double path catch internally), so
      // guard the throwing parse behind the byte-scan necessary condition:
      // strings that cannot possibly parse return NULL without an
      // exception; plausible ones take the original TRY semantics.
      // TryEval(ANSI cast) == TRY-mode cast, and — unlike a TRY Cast —
      // cannot re-match this rule, so the fixed-point converges.
      case c: Cast if c.isTryCast && c.child.resolved &&
          c.child.dataType.isInstanceOf[StringType] &&
          (c.dataType.isInstanceOf[DecimalType] ||
            c.dataType == DoubleType || c.dataType == FloatType) =>
        val floating = c.dataType == DoubleType || c.dataType == FloatType
        If(NumericParseable(c.child, floating),
          TryEval(Cast(c.child, c.dataType, c.timeZoneId, EvalMode.ANSI)),
          Literal(null, c.dataType))

      // DuckDB's VARCHAR→BOOLEAN accepts exactly {true, false, t, f, 1, 0}
      // case-insensitively, with NO whitespace trimming; Spark additionally
      // accepts y/yes/n/no and trims — a silent-divergence class found by
      // the round-13 probe grid (TRY_CAST('yes' AS BOOLEAN): NULL vs true).
      case c: Cast if c.isTryCast && c.child.resolved &&
          c.child.dataType.isInstanceOf[StringType] &&
          c.dataType == BooleanType =>
        val low = Lower(c.child)
        def in(vals: String*): Expression =
          In(low, vals.map(v => Literal(v): Expression))
        CaseWhen(Seq(
          (in("true", "t", "1"), Literal(true)),
          (in("false", "f", "0"), Literal(false))),
          Literal(null, BooleanType))
    }
}
