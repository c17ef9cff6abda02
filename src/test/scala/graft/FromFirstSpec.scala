package graft

import graft.dialect.FromFirst
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the FROM-first normalization pass (DuckDB grammar
  * verified on 1.0: the optional SELECT clause sits directly after the
  * from-list; `FROM t WHERE p SELECT x` is a DuckDB parse error too).
  * Rewrites are compared whitespace-normalized — the pass reconstructs
  * raw spans and inserts a newline separator (which keeps trailing `--`
  * comments from swallowing relocated text). */
class FromFirstSpec extends AnyFunSuite {

  private def rw(s: String) = FromFirst.rewrite(s)
  private def norm(s: String) = s.replaceAll("\\s+", " ").trim

  private def assertRw(in: String, want: String): Unit =
    assert(norm(rw(in)) === norm(want), s"\n  in: $in\n  out: ${rw(in)}")

  test("bare FROM synthesizes SELECT *") {
    assertRw("FROM t", "SELECT * FROM t")
    assertRw("FROM t WHERE x > 5", "SELECT * FROM t WHERE x > 5")
    assertRw("from t order by x", "SELECT * from t order by x")
  }

  test("SELECT clause relocates to the front") {
    assertRw("FROM t SELECT x", "SELECT x FROM t")
    assertRw("FROM t SELECT x, y WHERE x > 5", "SELECT x, y FROM t WHERE x > 5")
    assertRw("FROM t SELECT k, count(*) AS n GROUP BY k ORDER BY k",
      "SELECT k, count(*) AS n FROM t GROUP BY k ORDER BY k")
  }

  test("DISTINCT and expressions stay inside the relocated clause") {
    assertRw("FROM t SELECT DISTINCT x + 1 AS y WHERE x > 0",
      "SELECT DISTINCT x + 1 AS y FROM t WHERE x > 0")
  }

  test("joins stay inside the from-list") {
    assertRw("FROM a JOIN b ON a.k = b.k SELECT a.x, b.y WHERE a.x > 0",
      "SELECT a.x, b.y FROM a JOIN b ON a.k = b.k WHERE a.x > 0")
  }

  test("WITH definition list is skipped, main query rewrites") {
    assertRw("WITH c AS (SELECT 1 AS y) FROM c",
      "WITH c AS (SELECT 1 AS y) SELECT * FROM c")
    assertRw("WITH c AS (FROM t WHERE x > 1) SELECT y FROM c",
      "WITH c AS (SELECT * FROM t WHERE x > 1) SELECT y FROM c")
  }

  test("subquery blocks rewrite; nesting converges") {
    assertRw("SELECT * FROM (FROM t WHERE x > 8)",
      "SELECT * FROM (SELECT * FROM t WHERE x > 8)")
    assertRw("FROM (FROM t) u", "SELECT * FROM (SELECT * FROM t) u")
  }

  test("set-operation branches rewrite independently") {
    assertRw("FROM a UNION ALL FROM b",
      "SELECT * FROM a UNION ALL SELECT * FROM b")
    assertRw("FROM a SELECT x INTERSECT FROM b SELECT y",
      "SELECT x FROM a INTERSECT SELECT y FROM b")
  }

  test("star-EXCEPT is a select-list modifier, never a set-op boundary") {
    assertRw("FROM t SELECT * EXCEPT (k) WHERE x > 1",
      "SELECT * EXCEPT (k) FROM t WHERE x > 1")
  }

  test("line comment between list and clause cannot swallow relocated text") {
    val out = rw("FROM t SELECT x -- keep\nWHERE x > 1")
    assert(norm(out.replaceAll("--[^\n]*", "")) === "SELECT x FROM t WHERE x > 1",
      s"comment swallowed relocated text: $out")
  }

  test("SELECT-first SQL passes through byte-identically") {
    for (q <- Seq(
      "SELECT a FROM t",
      "SELECT a FROM t WHERE b IN (SELECT c FROM u)",
      "DELETE FROM t WHERE x = 1",
      "COPY t FROM 'x.csv'",
      "SELECT ' FROM t ' AS lit FROM u",
      "SELECT a FROM t UNION SELECT b FROM u",
      "WITH c AS (SELECT 1) SELECT * FROM c",
      "SELECT * EXCLUDE (k) FROM t"))
      assert(rw(q) === q, s"non-FROM-first text changed: $q")
  }
}
