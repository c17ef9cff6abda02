package graft

import graft.dialect.IntCastSyntax
import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** DuckDB numeric→integer CAST rounding (Spark truncates) — text contract
  * of the rewrite plus executed values pinned against DuckDB 1.0:
  * DOUBLE→int half-EVEN, DECIMAL→int half-AWAY, VARCHAR→int parse +
  * half-AWAY. */
class IntCastSpec extends AnyFunSuite {

  private def rw(s: String) = IntCastSyntax.rewrite(s)

  test("CAST(e AS INT/BIGINT/...) rewrites; non-integer targets stay") {
    assert(rw("SELECT CAST(x AS INT) FROM t") ===
      "SELECT graft_icast(x, 'int') FROM t")
    assert(rw("SELECT CAST(a + b AS BIGINT) FROM t") ===
      "SELECT graft_icast(a + b, 'bigint') FROM t")
    assert(rw("SELECT CAST(f(x, ',') AS SMALLINT) FROM t") ===
      "SELECT graft_icast(f(x, ','), 'smallint') FROM t")
    for (q <- Seq(
      "SELECT CAST(x AS DOUBLE) FROM t",
      "SELECT CAST(x AS VARCHAR) FROM t",
      "SELECT CAST(x AS DECIMAL(4,2)) FROM t",
      "SELECT CAST(x AS INT[]) FROM t",
      "SELECT 'CAST(x AS INT)' AS lit FROM t"))
      assert(rw(q) === q, s"changed: $q")
  }

  test("nested casts rewrite inside-out without touching outer targets") {
    assert(rw("SELECT CAST(CAST(a AS INT) AS VARCHAR) FROM t") ===
      "SELECT CAST(graft_icast(a, 'int') AS VARCHAR) FROM t")
  }

  test(":: postfix form rewrites; INTERVAL and array types excluded") {
    assert(rw("SELECT x::INT FROM t") === "SELECT graft_icast(x, 'int') FROM t")
    assert(rw("SELECT (a + b)::BIGINT FROM t") ===
      "SELECT graft_icast((a + b), 'bigint') FROM t")
    assert(rw("SELECT '2.5'::INTEGER") === "SELECT graft_icast('2.5', 'int')")
    for (q <- Seq(
      "SELECT x::INTERVAL FROM t",
      "SELECT x::DOUBLE FROM t",
      "SELECT CAST(x AS INT[]) FROM t"))
      assert(rw(q) === q, s"changed: $q")
  }

  test("executed values match DuckDB's type-dependent rounding") {
    val engine = new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
    val conn = engine.connect()
    def one(sql: String): Any = conn.queryDF(sql).collect().head.get(0)
    // DECIMAL literals: half-away
    assert(one("SELECT CAST(2.5 AS INT) AS x") === 3)
    assert(one("SELECT CAST(-2.5 AS INT) AS x") === -3)
    assert(one("SELECT CAST(2.4 AS INT) AS x") === 2)
    // DOUBLE: half-even (rint)
    assert(one("SELECT CAST(CAST(2.5 AS DOUBLE) AS INT) AS x") === 2)
    assert(one("SELECT CAST(CAST(3.5 AS DOUBLE) AS INT) AS x") === 4)
    assert(one("SELECT CAST(CAST(-2.5 AS DOUBLE) AS INT) AS x") === -2)
    // VARCHAR: parse then half-away
    assert(one("SELECT CAST('2.5' AS INT) AS x") === 3)
    assert(one("SELECT CAST('-2.5' AS INT) AS x") === -3)
    assert(one("SELECT '2.7'::BIGINT AS x") === 3L)
    // integral sources unchanged
    assert(one("SELECT CAST(7 AS BIGINT) AS x") === 7L)
    assert(one("SELECT CAST(TRUE AS INT) AS x") === 1)
  }
}
