package graft

import graft.dialect.NullOrder
import org.scalatest.funsuite.AnyFunSuite

/** NullOrder: DuckDB defaults to NULLS LAST in both sort directions
  * (default_null_order='nulls_last', verified against native DuckDB 1.0.0);
  * Spark's ASC default is NULLS FIRST. The pass must pin NULLS LAST onto
  * exactly the ascending keys that lack an explicit qualifier — at every
  * nesting depth — and touch nothing else. */
class NullOrderSpec extends AnyFunSuite {

  test("bare ascending key gets NULLS LAST") {
    assert(NullOrder.rewrite("SELECT x FROM t ORDER BY x") ==
      "SELECT x FROM t ORDER BY x NULLS LAST")
    assert(NullOrder.rewrite("SELECT x FROM t ORDER BY x ASC") ==
      "SELECT x FROM t ORDER BY x ASC NULLS LAST")
  }

  test("DESC and explicit NULLS qualifiers pass through") {
    assert(NullOrder.rewrite("SELECT x FROM t ORDER BY x DESC") ==
      "SELECT x FROM t ORDER BY x DESC")
    assert(NullOrder.rewrite("SELECT x FROM t ORDER BY x NULLS FIRST") ==
      "SELECT x FROM t ORDER BY x NULLS FIRST")
    assert(NullOrder.rewrite("SELECT x FROM t ORDER BY x DESC NULLS FIRST") ==
      "SELECT x FROM t ORDER BY x DESC NULLS FIRST")
  }

  test("mixed key list pins only the ascending keys") {
    assert(NullOrder.rewrite("SELECT 1 FROM t ORDER BY a, b DESC, f(x, y) ASC LIMIT 3") ==
      "SELECT 1 FROM t ORDER BY a NULLS LAST, b DESC, f(x, y) ASC NULLS LAST LIMIT 3")
  }

  test("window ORDER BY is pinned and the frame spec survives") {
    val in = "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts " +
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t"
    val out = "SELECT sum(v) OVER (PARTITION BY k ORDER BY ts NULLS LAST " +
      "ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) FROM t"
    assert(NullOrder.rewrite(in) == out)
    // RANGE frame terminates the key list the same way
    assert(NullOrder.rewrite(
      "SELECT max(v) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) FROM t") ==
      "SELECT max(v) OVER (ORDER BY ts NULLS LAST RANGE BETWEEN INTERVAL 1 HOUR PRECEDING AND CURRENT ROW) FROM t")
  }

  test("subquery and outer clause both pinned; LIMIT terminates each") {
    assert(NullOrder.rewrite(
      "SELECT * FROM (SELECT x FROM t ORDER BY x LIMIT 3) s ORDER BY x") ==
      "SELECT * FROM (SELECT x FROM t ORDER BY x NULLS LAST LIMIT 3) s ORDER BY x NULLS LAST")
  }

  test("WITHIN GROUP is left untouched") {
    val sql = "SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY v) FROM t"
    assert(NullOrder.rewrite(sql) == sql)
  }

  test("literals containing ORDER BY or trailing desc are not confused") {
    val sql = "SELECT 'ORDER BY x' FROM t"
    assert(NullOrder.rewrite(sql) == sql)
    // a key whose text ENDS in a literal 'desc' is still an ascending key
    assert(NullOrder.rewrite("SELECT 1 FROM t ORDER BY coalesce(s, 'desc')") ==
      "SELECT 1 FROM t ORDER BY coalesce(s, 'desc') NULLS LAST")
  }

  test("set operations terminate the clause") {
    assert(NullOrder.rewrite(
      "SELECT x FROM t ORDER BY x UNION ALL SELECT y FROM u ORDER BY y") ==
      "SELECT x FROM t ORDER BY x NULLS LAST UNION ALL SELECT y FROM u ORDER BY y NULLS LAST")
  }

  test("engine path returns DuckDB's row set under LIMIT with nullable keys") {
    val engine = new session.Engine(
      session.EngineConfig(existingSession = Some(SparkTestSession.spark)))
    val conn = engine.connect()
    // native DuckDB 1.0.0: [1, 2] — nulls sort last, so the LIMIT excludes
    // them; unfixed Spark would return [NULL, 1]
    val asc = conn.queryDF(
      "SELECT x FROM (VALUES (2),(NULL),(1)) t(x) ORDER BY x LIMIT 2")
      .collect().map(r => Option(r.get(0)).map(_.toString).orNull)
    assert(asc.toSeq == Seq("1", "2"))
    // windows too: DuckDB's row_number over ORDER BY v puts the null row last
    val rn = conn.queryDF(
      "SELECT v, row_number() OVER (ORDER BY v) AS rn " +
        "FROM (VALUES (10),(NULL),(7)) t(v) ORDER BY rn")
      .collect().map(r => (Option(r.get(0)).map(_.toString).orNull, r.getInt(1)))
    assert(rn.toSeq == Seq(("7", 1), ("10", 2), (null, 3)))
  }
}
