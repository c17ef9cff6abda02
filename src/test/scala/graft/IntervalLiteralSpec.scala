package graft

import graft.dialect.IntervalLiteral
import org.apache.spark.sql.functions.col
import org.scalatest.funsuite.AnyFunSuite

/** The multi-unit INTERVAL literal rewrite (round 15) at the text level —
  * behavior is pinned end-to-end by wave-9 probes + q131; this spec pins
  * the rewriter's BOUNDARIES: what must be rewritten, what must pass
  * through untouched, and that same-family ANSI comparisons never route
  * through the calCompare scalar (pushdown stays native). */
class IntervalLiteralSpec extends AnyFunSuite {

  private def rw(sql: String): String = IntervalLiteral.rewrite(sql)

  test("multi-unit, fractional, exotic-unit and time-tail literals rewrite") {
    assert(rw("SELECT INTERVAL '400 days 26 hours'") ==
      "SELECT make_interval(0, 0, 0, 400, 0, 0, 93600.000000)")
    assert(rw("SELECT INTERVAL '1 month 5 days'") ==
      "SELECT make_interval(0, 1, 0, 5, 0, 0, 0.000000)")
    // fraction spill: 1.5 months = 1 month + 15 days (probed)
    assert(rw("SELECT INTERVAL '1.5 months'") ==
      "SELECT make_interval(0, 1, 0, 15, 0, 0, 0.000000)")
    // exotic single units Spark's literal grammar lacks
    assert(rw("SELECT INTERVAL '2 quarters'") ==
      "SELECT make_interval(0, 6, 0, 0, 0, 0, 0.000000)")
    // hh:mm:ss tail
    assert(rw("SELECT INTERVAL '1 day 01:30:00'") ==
      "SELECT make_interval(0, 0, 0, 1, 0, 0, 5400.000000)")
    // micros truncate toward zero (probed '1.9999996 seconds')
    assert(rw("SELECT INTERVAL '1.9999996 seconds'") ==
      "SELECT make_interval(0, 0, 0, 0, 0, 0, 1.999999)")
  }

  test("single-unit integer and ANSI-form literals pass through untouched") {
    for (sql <- Seq(
        "SELECT INTERVAL '3 days'",
        "SELECT INTERVAL '26 hours'",
        "SELECT ts + INTERVAL '1' DAY",
        "SELECT INTERVAL '1-2' YEAR TO MONTH",
        "SELECT INTERVAL '4' DAY",
        "SELECT INTERVAL '1 fortnight'", // unknown unit: Spark rejects loudly
        "SELECT 'INTERVAL is a keyword' AS s"))
      assert(rw(sql) == sql, sql)
  }

  test("literal and comment interiors are never rewritten (masked scan)") {
    // a doubled-quote literal whose interior spells INTERVAL'<units>'
    // must stay byte-identical (the raw-scan bug corrupted it)
    val s1 = "SELECT 'tag INTERVAL''1 month 2 days' AS s"
    assert(rw(s1) == s1)
    // INTERVAL inside a line comment followed by a genuine string literal
    val s2 = "SELECT x, -- INTERVAL\n '1 month 2 days' AS s FROM t"
    assert(rw(s2) == s2)
    val s3 = "SELECT /* INTERVAL */ '2 months 3 days' AS s"
    assert(rw(s3) == s3)
    // masking must not suppress a REAL literal in the same statement
    assert(rw("SELECT '- INTERVAL -' AS s, INTERVAL '1 month 5 days' AS i") ==
      "SELECT '- INTERVAL -' AS s, make_interval(0, 1, 0, 5, 0, 0, 0.000000) AS i")
  }

  test("IS NOT DISTINCT FROM keeps null-safe semantics across interval families") {
    val spark = SparkTestSession.spark
    val r = spark.sql(
      """SELECT CAST(NULL AS INTERVAL MONTH) <=> CAST(NULL AS INTERVAL DAY) AS bothnull,
        |       make_ym_interval(0, 1) <=> CAST(NULL AS INTERVAL DAY) AS onenull,
        |       make_ym_interval(0, 1) <=> make_dt_interval(30) AS eq,
        |       make_ym_interval(0, 1) <=> make_dt_interval(31) AS ne""".stripMargin)
      .head
    assert(r.getBoolean(0), "NULL <=> NULL must stay true under the rewrite")
    assert(!r.getBoolean(1))
    assert(r.getBoolean(2)) // 1 month ≡ 30 days under normalize-entries
    assert(!r.getBoolean(3))
  }

  test("same-family ANSI interval comparisons keep Spark's native operator") {
    val spark = SparkTestSession.spark
    import spark.implicits._
    val df = Seq((1L, 3L)).toDF("a", "b")
      .selectExpr("make_dt_interval(a) AS ia", "make_dt_interval(b) AS ib")
      .filter(col("ia") < col("ib"))
    val analyzed = df.queryExecution.analyzed.toString
    assert(!analyzed.contains("calCompare"),
      s"same-family DT comparison must stay native:\n$analyzed")
    assert(df.count() == 1)
    // cross-family routes through the normalized compare
    val cross = Seq((1, 40)).toDF("m", "d")
      .selectExpr("make_ym_interval(0, m) AS ym", "make_dt_interval(d) AS dt")
      .filter(col("ym") < col("dt"))
    val crossPlan = cross.queryExecution.analyzed.toString
    assert(crossPlan.contains("calCompare"),
      s"cross-family comparison must normalize:\n$crossPlan")
    assert(cross.count() == 1) // 1 month (30 d) < 40 d
  }
}
