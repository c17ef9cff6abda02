package graft

import graft.functions.{TryCastParseRule, TryParseIntegral}
import org.apache.spark.sql.execution.WholeStageCodegenExec
import org.scalatest.funsuite.AnyFunSuite

/** Parity + plan-shape pins for the exception-free TRY_CAST rewrite.
  *
  * Parity: Spark's own try_cast is the reference — the same probe matrix
  * must produce identical results through TryParseIntegral (the rule is
  * active in the shared test session via registerAll, so `try_cast` here IS
  * the rewritten path; the reference values are computed with the rule
  * stripped from the session's experimental list).
  */
class TryParseSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private val probes: Seq[String] = Seq(
    null, "42", " 42", "42 ", " 42 ", "\t12\n", "+7", "-7", "007", "",
    " ", "abc", "1.5", "1.0", "1e3", "12abc", "0x1A", "+", "-", "٤٢",
    "2147483647", "2147483648", "-2147483648", "-2147483649",
    "127", "128", "-128", "-129", "32767", "32768", "-32768", "-32769",
    "9223372036854775807", "9223372036854775808", "-9223372036854775808",
    "-9223372036854775809")

  private val targets = Seq("tinyint", "smallint", "int", "bigint")

  private def probeResults(): Seq[Seq[Any]] = {
    graft.functions.registerAll(spark)
    import scala.jdk.CollectionConverters._
    val df = spark.createDataFrame(
      probes.map(org.apache.spark.sql.Row(_)).asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("s",
          org.apache.spark.sql.types.StringType, nullable = true))))
    df.selectExpr("s" +: targets.map(t => s"try_cast(s as $t) as to_$t"): _*)
      .collect().toSeq.map(_.toSeq)
  }

  test("wrapper parse matches Spark try_cast on the full probe matrix") {
    val withRule = probeResults()
    // strip the rule → Spark's built-in throwing TRY path as the reference
    val saved = spark.experimental.extraOptimizations
    val without =
      try {
        spark.experimental.extraOptimizations =
          saved.filterNot(_ eq TryCastParseRule)
        probeResults()
      } finally spark.experimental.extraOptimizations = saved
    assert(withRule === without)
  }

  test("rule rewrites TRY-mode string casts and stays in codegen") {
    graft.functions.registerAll(spark)
    val df = spark.range(10).selectExpr("CAST(id AS STRING) s")
      .selectExpr("try_cast(s as bigint) v")
    val optimized = df.queryExecution.optimizedPlan
    assert(optimized.expressions.exists(_.exists(_.isInstanceOf[TryParseIntegral])),
      s"TRY_CAST not rewritten:\n$optimized")
    val exec = df.queryExecution.executedPlan
    assert(exec.exists(_.isInstanceOf[WholeStageCodegenExec]),
      s"rewritten plan fell out of codegen:\n$exec")
    assert(df.collect().map(_.getLong(0)).toSeq === (0L until 10L))
  }

  test("non-string and non-integral TRY casts are left to Spark") {
    graft.functions.registerAll(spark)
    val df = spark.range(5).selectExpr(
      "try_cast(id AS int) a",              // long → int: not a string parse
      "try_cast(CAST(id AS STRING) AS double) b") // string → double: unhandled
    assert(!df.queryExecution.optimizedPlan.expressions
      .exists(_.exists(_.isInstanceOf[TryParseIntegral])))
    assert(df.count() === 5)
  }
}
