package graft

import graft.dialect.WindowFilter
import org.scalatest.funsuite.AnyFunSuite

/** Unit contract of the window-FILTER fold (DuckDB FILTER clause on
  * window aggregates; Spark raises "not supported yet" natively). */
class WindowFilterSpec extends AnyFunSuite {

  private def rw(s: String) = WindowFilter.rewrite(s)
  private def norm(s: String) = s.replaceAll("\\s+", " ").trim

  test("sum/min folds the predicate into a CASE argument") {
    assert(norm(rw("SELECT sum(x) FILTER (WHERE p > 1) OVER (ORDER BY k) FROM t")) ===
      "SELECT sum(CASE WHEN p > 1 THEN x END) OVER (ORDER BY k) FROM t")
    assert(norm(rw("SELECT min(v) FILTER (WHERE s <> 'P') OVER w FROM t WINDOW w AS (ORDER BY k)")) ===
      "SELECT min(CASE WHEN s <> 'P' THEN v END) OVER w FROM t WINDOW w AS (ORDER BY k)")
  }

  test("count(*) folds to count(CASE WHEN p THEN 1 END)") {
    assert(norm(rw("SELECT count(*) FILTER (WHERE g = 1) OVER (ORDER BY k) FROM t")) ===
      "SELECT count(CASE WHEN g = 1 THEN 1 END) OVER (ORDER BY k) FROM t")
  }

  test("DISTINCT argument keeps the DISTINCT outside the CASE") {
    assert(norm(rw("SELECT count(DISTINCT v) FILTER (WHERE g = 1) OVER (PARTITION BY g) FROM t")) ===
      "SELECT count(DISTINCT CASE WHEN g = 1 THEN v END) OVER (PARTITION BY g) FROM t")
  }

  test("grouped-aggregate FILTER (no OVER) is native Spark and passes through") {
    val q = "SELECT sum(x) FILTER (WHERE p) AS s FROM t GROUP BY g"
    assert(rw(q) === q)
  }

  test("row-order and multi-argument aggregates are left for Spark's loud error") {
    for (q <- Seq(
      "SELECT first_value(x) FILTER (WHERE p) OVER (ORDER BY k) FROM t",
      "SELECT corr(x, y) FILTER (WHERE p) OVER (ORDER BY k) FROM t",
      "SELECT sum(x, y) FILTER (WHERE p) OVER (ORDER BY k) FROM t"))
      assert(rw(q) === q, s"unsupported shape was rewritten: $q")
  }

  test("multiple sites in one query all fold; literals stay untouched") {
    val q = "SELECT sum(x) FILTER (WHERE a) OVER (ORDER BY k)," +
      " avg(y) FILTER (WHERE b) OVER (ORDER BY k), ' FILTER (WHERE c) OVER ' FROM t"
    val out = rw(q)
    assert(norm(out) === "SELECT sum(CASE WHEN a THEN x END) OVER (ORDER BY k)," +
      " avg(CASE WHEN b THEN y END) OVER (ORDER BY k), ' FILTER (WHERE c) OVER ' FROM t")
  }

  test("nested predicate parens and subqueries inside the predicate survive") {
    assert(norm(rw("SELECT sum(x) FILTER (WHERE (a + 1) > f(b, ')')) OVER (ORDER BY k) FROM t")) ===
      "SELECT sum(CASE WHEN (a + 1) > f(b, ')') THEN x END) OVER (ORDER BY k) FROM t")
  }
}
