package graft

import graft.dialect.WindowExclude
import org.scalatest.funsuite.AnyFunSuite

/** WindowExclude: frame EXCLUDE CURRENT ROW splits into the [a,-1] ⊕ [+1,b]
  * halves; unsupported exclusion shapes must pass through untouched. */
class WindowExcludeSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("split halves equal a hand-computed exclusion") {
    Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT o_orderkey,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS s,
        |  min(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |    ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE CURRENT ROW) AS m
        |FROM orders""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"))
    val got = spark.sql(rewritten)
    // reference: full-frame minus current row, computed per aggregate
    val ref = spark.sql(
      """SELECT o_orderkey,
        |  CASE WHEN count(*) OVER w > 1
        |       THEN (sum(o_totalprice) OVER w) - o_totalprice END AS s,
        |  CASE WHEN count(*) OVER w > 1 THEN
        |    least(coalesce(min(o_totalprice) OVER
        |            (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND 1 PRECEDING), o_totalprice + 1e18),
        |          coalesce(min(o_totalprice) OVER
        |            (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 1 FOLLOWING AND 2 FOLLOWING), o_totalprice + 1e18))
        |  END AS m
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderkey
        |             ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING)""".stripMargin)
    // the sum column is compared at the driver gate's 6-dp tolerance (the
    // split-halves double sum and the subtract-reference differ in ulps)
    import org.apache.spark.sql.functions.{col, round}
    def norm(df: org.apache.spark.sql.DataFrame) =
      df.select(col("o_orderkey"), round(col("s"), 4).as("s"), col("m"))
    assert(norm(got).exceptAll(norm(ref)).count() == 0 &&
      norm(ref).exceptAll(norm(got)).count() == 0)
  }

  test("both halves plan into a single Window operator") {
    Tables.registerAll(spark, sfDir)
    val df = spark.sql(WindowExclude.rewrite(
      """SELECT sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderkey
        |  ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING EXCLUDE CURRENT ROW) AS s
        |FROM orders""".stripMargin))
    val plan = df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
    assert(plan.split("\\bWindow\\b").length - 1 == 1,
      s"expected exactly one Window operator:\n$plan")
  }

  test("EXCLUDE NO OTHERS is stripped, TIES/GROUP and RANGE pass through") {
    val noOthers = WindowExclude.rewrite(
      "SELECT sum(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE NO OTHERS) FROM t")
    assert(!noOthers.toUpperCase.contains("EXCLUDE"))
    assert(noOthers.toUpperCase.contains("ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"))
    val ties =
      "SELECT sum(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) FROM t"
    assert(WindowExclude.rewrite(ties) == ties)
    val range =
      "SELECT sum(x) OVER (ORDER BY y RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM t"
    assert(WindowExclude.rewrite(range) == range)
  }

  test("named WINDOW with EXCLUDE is inlined; without EXCLUDE it is kept") {
    val named = WindowExclude.rewrite(
      """SELECT sum(x) OVER w, count(*) OVER w FROM t
        |WINDOW w AS (ORDER BY y ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW)""".stripMargin)
    assert(!named.toUpperCase.contains("EXCLUDE") &&
      !named.toUpperCase.contains("WINDOW W AS"))
    val plain =
      """SELECT sum(x) OVER w FROM t
        |WINDOW w AS (ORDER BY y ROWS BETWEEN 1 PRECEDING AND CURRENT ROW)""".stripMargin
    assert(WindowExclude.rewrite(plain) == plain)
  }

  test("EXCLUDE inside a string literal is untouched") {
    val lit = "SELECT 'ROWS EXCLUDE CURRENT ROW' AS s, sum(x) OVER (ORDER BY y) FROM t"
    assert(WindowExclude.rewrite(lit) == lit)
  }
}
