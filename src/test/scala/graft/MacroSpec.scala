package graft

import graft.dialect.MacroRegistry
import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** CREATE MACRO / DROP MACRO: registry semantics and end-to-end expansion
  * through the engine Connection (scalar, table, defaults, nesting). */
class MacroSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private def prepare(): Unit =
    Tables.registerAll(SparkTestSession.spark, SparkTestSession.sfDir)

  test("scalar macro expands with parenthesized arguments") {
    val r = new MacroRegistry
    r.dispatch("CREATE MACRO add1(x) AS x + 1")
    assert(r.expand("SELECT add1(c) FROM t") === "SELECT ((c) + 1) FROM t")
    // precedence survives: the argument is parenthesized
    r.dispatch("CREATE MACRO twice(x) AS x * 2")
    assert(r.expand("SELECT twice(a + 1)") === "SELECT ((a + 1) * 2)")
    // inside a string literal: untouched
    assert(r.expand("SELECT 'add1(c)' AS s") === "SELECT 'add1(c)' AS s")
  }

  test("defaults and named arguments bind like DuckDB") {
    val r = new MacroRegistry
    r.dispatch("CREATE MACRO f(a, b := 10) AS a + b")
    assert(r.expand("SELECT f(1)") === "SELECT ((1) + (10))")
    assert(r.expand("SELECT f(1, b := 2)") === "SELECT ((1) + (2))")
    // missing required parameter: call left unexpanded
    assert(r.expand("SELECT f()") === "SELECT f()")
  }

  test("macros may call other macros (fixpoint expansion)") {
    val r = new MacroRegistry
    r.dispatch("CREATE MACRO add1(x) AS x + 1")
    r.dispatch("CREATE MACRO add2(x) AS add1(add1(x))")
    assert(r.expand("SELECT add2(c)") === "SELECT ((((((c)) + 1)) + 1))")
  }

  test("CREATE OR REPLACE and DROP MACRO dispatch through the connection") {
    prepare()
    conn.queryDF("CREATE MACRO __m_disc(p) AS p * 0.9")
    val v = conn.queryDF("SELECT __m_disc(100.0) AS v")
      .collect().head.getAs[Number](0).doubleValue()
    assert(math.abs(v - 90.0) < 1e-9)
    // un-replaced duplicate errors, OR REPLACE succeeds
    intercept[IllegalArgumentException] {
      conn.queryDF("CREATE MACRO __m_disc(p) AS p")
    }
    conn.queryDF("CREATE OR REPLACE MACRO __m_disc(p) AS p * 0.5")
    val v2 = conn.queryDF("SELECT __m_disc(100.0) AS v")
      .collect().head.getAs[Number](0).doubleValue()
    assert(math.abs(v2 - 50.0) < 1e-9)
    conn.queryDF("DROP MACRO __m_disc")
    intercept[Exception] { conn.queryDF("SELECT __m_disc(1) AS v").collect() }
  }

  test("table macro expands to a subquery in FROM position") {
    prepare()
    conn.queryDF(
      "CREATE OR REPLACE MACRO __m_topnation(k) AS TABLE " +
        "SELECT n_nationkey, n_name FROM nation ORDER BY n_nationkey LIMIT k")
    val rows = conn.queryDF("SELECT * FROM __m_topnation(3) t ORDER BY n_nationkey")
      .collect()
    assert(rows.map(_.getAs[Number](0).longValue()).toSeq === Seq(0L, 1L, 2L))
    conn.queryDF("DROP MACRO __m_topnation")
  }

  test("macro bodies with string literals survive the escape translation") {
    prepare()
    conn.queryDF(
      "CREATE OR REPLACE MACRO __m_tokens(s) AS " +
        """CAST(array_length(regexp_split_to_array(trim(s), '\s+')) AS BIGINT)""")
    val n = conn.queryDF("SELECT __m_tokens('a b  c') AS n")
      .collect().head.getLong(0)
    assert(n === 3L)
    conn.queryDF("DROP MACRO __m_tokens")
  }
}
