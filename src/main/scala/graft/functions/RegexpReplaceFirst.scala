package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** First-occurrence regex replacement — DuckDB's `regexp_replace` DEFAULT
  * (its 'g' option switches to the replace-all that Spark's built-in
  * `regexp_replace` always does; reference surface:
  * duckdb docs/sql/functions/regular_expressions). Spark has no
  * replace-first spelling, so the dialect layer rewrites un-flagged
  * `regexp_replace` calls to this expression.
  *
  * Same caching discipline as Spark's own RegExpReplace: the compiled
  * Pattern is reused while the per-row pattern string is unchanged (the
  * common literal-pattern case compiles exactly once per task), and the
  * codegen path keeps that cache in generated mutable state — stays inside
  * whole-stage codegen, no UDF boundary. The replacement string uses Java
  * semantics ($1 backrefs); the dialect rewrite translates DuckDB's \1
  * forms in literal replacements before the call reaches this expression.
  */
case class RegexpReplaceFirst(subject: Expression, regexp: Expression,
    rep: Expression) extends TernaryExpression {

  override def first: Expression = subject
  override def second: Expression = regexp
  override def third: Expression = rep
  override def dataType: DataType = StringType
  override def nullIntolerant: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    if (Seq(subject, regexp, rep).forall(_.dataType == StringType))
      TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      "regexp_replace_first needs (STRING, STRING, STRING), got " +
        Seq(subject, regexp, rep).map(_.dataType.simpleString).mkString("(", ", ", ")"))

  @transient private var lastRegex: UTF8String = _
  @transient private var lastPattern: java.util.regex.Pattern = _

  override def nullSafeEval(s: Any, p: Any, r: Any): Any = {
    val pu = p.asInstanceOf[UTF8String]
    if (pu != lastRegex) {
      lastRegex = pu.clone()
      lastPattern = java.util.regex.Pattern.compile(pu.toString)
    }
    UTF8String.fromString(
      lastPattern.matcher(s.toString).replaceFirst(r.toString))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val patternCls = classOf[java.util.regex.Pattern].getName
    val lastRegexRef = ctx.addMutableState("UTF8String", "rrfLastRegex")
    val lastPatternRef = ctx.addMutableState(patternCls, "rrfLastPattern")
    nullSafeCodeGen(ctx, ev, (s, p, r) => {
      s"""
         |if (!$p.equals($lastRegexRef)) {
         |  $lastRegexRef = $p.clone();
         |  $lastPatternRef = $patternCls.compile($p.toString());
         |}
         |${ev.value} = UTF8String.fromString(
         |  $lastPatternRef.matcher($s.toString()).replaceFirst($r.toString()));
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newFirst: Expression,
      newSecond: Expression, newThird: Expression): Expression =
    copy(subject = newFirst, regexp = newSecond, rep = newThird)
}
