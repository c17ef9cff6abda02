package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** DuckDB `//` parity (round 13): integral operands truncate; ANY
  * fractional operand (DOUBLE, or DECIMAL at any scale) degenerates to
  * plain DOUBLE division — probed on 1.0.0. The dialect keeps `//` → div
  * for precedence; the parse-level hook (graftbridge.ParsedSql) swaps the
  * parsed IntegralDivide for graft_fdiv, which dispatches on resolved
  * types. Plain spark.sql keeps Spark's div untouched. */
class FloorDivSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private def one(sql: String): Any = conn.queryDF(sql).collect().head.get(0)

  test("integral // integral truncates toward zero") {
    assert(one("SELECT 7 // 2") === 3L)
    assert(one("SELECT -7 // 2") === -3L)
  }

  test("fractional operands degenerate to plain DOUBLE division (DuckDB 1.0)") {
    assert(one("SELECT 7.5 // 2") === 3.75)
    assert(one("SELECT 7 // 2.5") === 2.8)
    assert(one("SELECT CAST(7.5 AS DOUBLE) // 2") === 3.75)
    // DECIMAL at scale 0 still counts as fractional in DuckDB
    assert(one("SELECT CAST(7 AS DECIMAL(5,0)) // 2") === 3.5)
    assert(one("SELECT CAST(-7.5 AS DOUBLE) // 2") === -3.75)
  }

  test("// by zero is NULL at every type (DuckDB parity; round-14 ADVICE)") {
    assert(one("SELECT 7 // 0") === null)
    assert(one("SELECT 7.5 // 0") === null)
    assert(one("SELECT CAST(7 AS DECIMAL(5,2)) // 0") === null)
    assert(one("SELECT CAST(7 AS DOUBLE) // CAST(0 AS DOUBLE)") === null)
  }

  test("// keeps multiplicative precedence: a * b // c = (a*b) // c") {
    assert(one("SELECT 4 * 3 // 5") === 2L)   // (12)//5, not 4*(3//5)=0
    assert(one("SELECT 10 + 1 // 2 * 3") === 10L) // 10 + ((1//2)*3)
  }

  test("plain spark.sql keeps Spark's div semantics (hook is engine-scoped)") {
    // Spark: decimal div truncates integrally — unchanged outside the engine
    assert(SparkTestSession.spark.sql("SELECT 7.5 div 2").collect().head.get(0) === 3L)
  }
}
