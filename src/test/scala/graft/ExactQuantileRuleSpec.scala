package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantileRule: grouped exact `percentile` rewritten to the
  * histogram + spillable-window shape — equality with the map-buffer
  * implementation, the plan guarantee (no percentile ObjectHashAggregate),
  * null semantics through the stitch join, and the bail-outs. */
class ExactQuantileRuleSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.exactQuantileRewrite", on.toString)
    try f finally spark.conf.set("spark.graft.exactQuantileRewrite", "true")
  }

  private val mixedSql =
    """SELECT o_orderpriority, count(*) AS n,
      |  percentile(o_totalprice, 0.5) AS med,
      |  percentile(o_totalprice, 0.95) AS p95,
      |  percentile(o_custkey, 0.25) AS p25_cust,
      |  avg(o_totalprice) AS avg_price
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  test("grouped percentile plan carries no percentile aggregate buffer") {
    Tables.registerAll(spark, sfDir)
    val plan = spark.sql(mixedSql).queryExecution.executedPlan.toString
    assert(!plan.contains("percentile"),
      s"expected the histogram+window shape, found a percentile buffer in:\n$plan")
    assert(plan.contains("Window"), "the spillable running-count window is the point")
  }

  test("rewritten results equal the map-buffer percentile (mixed aggs, 3 quantiles, 2 measures)") {
    Tables.registerAll(spark, sfDir)
    val on = withRule(on = true)(spark.sql(mixedSql).collect())
    val off = withRule(on = false)(spark.sql(mixedSql).collect())
    assert(on.length === off.length && on.length > 0)
    on.zip(off).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        (a.get(i), b.get(i)) match {
          case (x: Double, y: Double) => assert(math.abs(x - y) < 1e-9)
          case (x, y) => assert(x === y)
        }
      }
    }
  }

  test("groups whose measure is entirely NULL surface a NULL quantile") {
    import spark.implicits._
    Seq((1, Option.empty[Double]), (1, None), (2, Some(5.0)), (2, Some(7.0)))
      .toDF("g", "v").createOrReplaceTempView("eq_nulls")
    val rows = spark.sql(
      "SELECT g, percentile(v, 0.5) AS m, count(*) AS c FROM eq_nulls GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).isNullAt(1) && rows(0).getLong(2) === 2)
    assert(rows(1).getDouble(1) === 6.0 && rows(1).getLong(2) === 2)
  }

  test("bail-outs keep the original aggregate: global, DISTINCT, FILTER, array pct") {
    Tables.registerAll(spark, sfDir)
    val keep = Seq(
      "SELECT percentile(o_totalprice, 0.5) AS m FROM orders",
      "SELECT o_orderpriority, percentile(DISTINCT o_totalprice, 0.5) AS m " +
        "FROM orders GROUP BY o_orderpriority",
      "SELECT o_orderpriority, percentile(o_totalprice, 0.5) " +
        "FILTER (WHERE o_custkey > 10) AS m FROM orders GROUP BY o_orderpriority",
      "SELECT o_orderpriority, percentile(o_totalprice, array(0.25, 0.75)) AS m " +
        "FROM orders GROUP BY o_orderpriority")
    keep.foreach { sql =>
      val plan = spark.sql(sql).queryExecution.executedPlan.toString
      assert(plan.contains("percentile"), s"should NOT rewrite: $sql\n$plan")
    }
  }

  test("median spelling routes through the rewrite too") {
    Tables.registerAll(spark, sfDir)
    val q = spark.sql(
      "SELECT o_orderpriority, median(o_totalprice) AS m FROM orders " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    assert(!q.queryExecution.executedPlan.toString.contains("percentile"))
    val on = q.collect()
    val off = withRule(on = false)(spark.sql(
      "SELECT o_orderpriority, median(o_totalprice) AS m FROM orders " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority").collect())
    on.zip(off).foreach { case (a, b) =>
      assert(math.abs(a.getDouble(1) - b.getDouble(1)) < 1e-9)
    }
  }
}
