package graft

import graft.dialect.AsofJoinSql
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ASOF JOIN SQL rewrite: textual shape, equivalence with the programmatic
  * asofJoin operator, LEFT and forward forms, and the leave-alone cases. */
class AsofJoinSqlSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  test("rewrites to an equi-join with a lead() validity window") {
    val out = AsofJoinSql.rewrite(
      "SELECT * FROM l a ASOF JOIN r b ON a.k = b.k AND a.t >= b.t")
    assert(out.contains("JOIN (SELECT *, lead(t) OVER (PARTITION BY k ORDER BY t) AS __asof_nxt FROM r __asof_src) b"))
    assert(out.contains("ON a.k = b.k AND a.t >= b.t AND (b.__asof_nxt IS NULL OR a.t < b.__asof_nxt)"))
    // LEFT form keeps unmatched left rows
    assert(AsofJoinSql.rewrite(
      "SELECT * FROM l a ASOF LEFT JOIN r b ON a.k = b.k AND a.t >= b.t")
      .contains("LEFT JOIN (SELECT"))
    // forward form uses lag and flips the bound
    val fwd = AsofJoinSql.rewrite(
      "SELECT * FROM l a ASOF JOIN r b ON a.k = b.k AND a.t <= b.t")
    assert(fwd.contains("lag(t)") && fwd.contains("__asof_prv") &&
      fwd.contains("a.t > b.__asof_prv"))
  }

  test("unsupported shapes and literals pass through untouched") {
    // OR in the condition: not a conjunction — leave for Spark to reject
    val or = "SELECT * FROM l a ASOF JOIN r b ON a.k = b.k OR a.t >= b.t"
    assert(AsofJoinSql.rewrite(or) === or)
    // two inequalities
    val two = "SELECT * FROM l a ASOF JOIN r b ON a.t >= b.t AND a.t < b.u"
    assert(AsofJoinSql.rewrite(two) === two)
    // inside a string literal
    val lit = "SELECT 'x ASOF JOIN y ON a.t >= b.t' AS s"
    assert(AsofJoinSql.rewrite(lit) === lit)
  }

  test("SQL form equals the programmatic asofJoin on real events") {
    Tables.registerAll(spark, dir)
    val ev = Tables.load(spark, dir, "events")
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id").as("purchase_id"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
    // asofJoin keeps only (key, __t, __match, __match_t) — compare on the
    // (user_id, purchase ts, matched click) triple, which identifies rows
    val expected = graft.operators.TemporalJoins.asofJoin(
        purchases, clicks, key = "user_id", leftTime = "ts",
        rightTime = "ts", rightPayload = "click_id")
      .filter(col("__match").isNotNull)
      .select(col("user_id"), col("__t").as("ts"), col("__match").as("click_id"))
    val sql = graft.dialect.DialectSugar.rewrite(
      """SELECT p.user_id, p.ts, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)
    val got = spark.sql(sql)
    assert(got.count() > 0)
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("ASOF LEFT JOIN null-extends purchases with no prior click") {
    Tables.registerAll(spark, dir)
    val sql = graft.dialect.DialectSugar.rewrite(
      """SELECT p.event_id, c.event_id AS click_id
        |FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
        |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin)
    val got = spark.sql(sql)
    val purchases = Tables.load(spark, dir, "events")
      .filter(col("event_type") === "purchase").count()
    assert(got.count() === purchases) // every purchase exactly once
  }
}
