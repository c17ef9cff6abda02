package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** `SET strict_math = true`: out-of-domain math errors loudly with
  * DuckDB's message text (probed verbatim on 1.0.0); default stays
  * Spark-lenient. Also pins the round-13 log-base fix: DuckDB's 1-arg
  * log(x) is BASE 10, not ln. */
class StrictMathSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private def one(sql: String): Any = conn.queryDF(sql).collect().head.get(0)

  private def withStrict[T](f: => T): T = {
    conn.queryDF("SET strict_math = true")
    try f finally conn.queryDF("RESET strict_math")
  }

  test("default (lenient): out-of-domain math yields NULL, like Spark") {
    assert(one("SELECT ln(0)") == null)
    assert(one("SELECT sqrt(-1)") == null ||
      one("SELECT sqrt(-1)").asInstanceOf[Double].isNaN)
    assert(one("SELECT current_setting('strict_math')") === "false")
  }

  test("strict: the six kernels raise DuckDB's error text") {
    withStrict {
      val cases = Seq(
        "SELECT ln(0)" -> "cannot take logarithm of zero",
        "SELECT ln(-1)" -> "cannot take logarithm of a negative number",
        "SELECT log10(0)" -> "cannot take logarithm of zero",
        "SELECT log2(-3)" -> "cannot take logarithm of a negative number",
        "SELECT log(0)" -> "cannot take logarithm of zero", // 1-arg log = log10
        "SELECT sqrt(-1)" -> "cannot take square root of a negative number",
        "SELECT asin(2)" -> "ASIN is undefined outside [-1,1]",
        "SELECT acos(-2)" -> "ACOS is undefined outside [-1,1]")
      for ((sql, msg) <- cases) {
        val ex = intercept[Exception] { conn.queryDF(sql).collect() }
        assert(ex.getMessage.contains(msg), s"$sql → ${ex.getMessage}")
      }
    }
  }

  test("strict: in-domain values and NULLs are untouched") {
    withStrict {
      assert(math.abs(one("SELECT ln(exp(1.0))").asInstanceOf[Double] - 1.0) < 1e-12)
      assert(one("SELECT sqrt(4)") === 2.0)
      assert(math.abs(one("SELECT asin(1)").asInstanceOf[Double] - math.Pi / 2) < 1e-12)
      assert(one("SELECT ln(CAST(NULL AS DOUBLE))") == null)
      // names inside string literals are untouched
      assert(one("SELECT 'ln(0)'") === "ln(0)")
      // power intentionally NOT wrapped: DuckDB yields nan/inf too
      assert(one("SELECT power(0.0, -1)").asInstanceOf[Double].isInfinite)
    }
  }

  test("1-arg log(x) is base 10 (DuckDB), 2-arg log(b, x) passes through") {
    assert(one("SELECT log(100)") === 2.0)
    assert(one("SELECT log(2, 8)") === 3.0)
    assert(math.abs(one("SELECT ln(exp(2.0))").asInstanceOf[Double] - 2.0) < 1e-12)
  }
}
