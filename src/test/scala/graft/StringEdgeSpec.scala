package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** String-function edge parity pinned against DuckDB 1.0 (differential
  * probing, round 12): NULL-skipping stringifying concat, negative-n
  * left/right, plus regression pins on the edges that already agreed. */
class StringEdgeSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()
  private def one(sql: String): Any = conn.queryDF(sql).collect().head.get(0)

  test("concat skips NULLs and stringifies (DuckDB semantics)") {
    assert(one("SELECT concat('abc', NULL) AS x") === "abc")
    assert(one("SELECT concat('a', 1, NULL, 2.5) AS x") === "a12.5")
    // || stays null-intolerant, like DuckDB's operator
    assert(conn.queryDF("SELECT 'abc' || NULL AS x").collect().head.isNullAt(0))
  }

  test("left/right accept negative n = drop from the other end") {
    assert(one("SELECT left('hello', -2) AS x") === "hel")
    assert(one("SELECT right('hello', -2) AS x") === "llo")
    assert(one("SELECT left('hello', 2) AS x") === "he")
    assert(one("SELECT right('hello', 2) AS x") === "lo")
    assert(one("SELECT left('hello', 99) AS x") === "hello")
    assert(one("SELECT right('hello', 99) AS x") === "hello")
    assert(one("SELECT left('hello', 0) AS x") === "")
    assert(one("SELECT right('hello', 0) AS x") === "")
    assert(one("SELECT left('ab', -5) AS x") === "")
    assert(one("SELECT right('ab', -5) AS x") === "")
  }

  test("edges that already agreed stay pinned") {
    assert(one("SELECT split_part('a,b,c', ',', -1) AS x") === "c")
    assert(one("SELECT split_part('a,b,c', ',', 9) AS x") === "")
    assert(one("SELECT greatest(1, NULL, 3) AS x") === 3)
    assert(one("SELECT contains('hello', '') AS x") === true)
    assert(one("SELECT datediff('month', DATE '2020-01-31', DATE '2020-03-01') AS x") === 2)
    assert(String.valueOf(one("SELECT last_day(DATE '2020-02-05') AS x")) === "2020-02-29")
  }
}
