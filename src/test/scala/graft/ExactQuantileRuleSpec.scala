package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.aggregate.{HashAggregateExec, ObjectHashAggregateExec, SortAggregateExec}
import org.apache.spark.sql.execution.exchange.{ReusedExchangeExec, ShuffleExchangeExec}
import org.apache.spark.sql.catalyst.plans.physical.{RangePartitioning, SinglePartition}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** ExactQuantileRule: grouped AND global exact `percentile` (scalar and
  * array percentages) rewritten to the histogram + spillable-window shape —
  * equality with the map-buffer implementation, the plan guarantees (no
  * percentile ObjectHashAggregate; for the global form, one reused range
  * exchange and no data-sized SinglePartition), null semantics through the
  * stitch join, and the bail-outs. */
class ExactQuantileRuleSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.exactQuantileRewrite", on.toString)
    try f finally spark.conf.set("spark.graft.exactQuantileRewrite", "true")
  }

  private def assertSameRows(sql: String): Unit = {
    val on = withRule(on = true)(spark.sql(sql).collect())
    val off = withRule(on = false)(spark.sql(sql).collect())
    assert(on.length === off.length && on.length > 0)
    on.zip(off).foreach { case (a, b) =>
      (0 until a.length).foreach { i =>
        (a.get(i), b.get(i)) match {
          case (x: Double, y: Double) => assert(math.abs(x - y) < 1e-9)
          case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
            assert(x.length === y.length)
            x.zip(y).foreach {
              case (xe: Double, ye: Double) => assert(math.abs(xe - ye) < 1e-9)
              case (xe, ye) => assert(xe === ye)
            }
          case (x, y) => assert(x === y)
        }
      }
    }
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
    assertSameRows(mixedSql)
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

  // ------------------------------------------------- array percentages (r8)

  test("grouped ARRAY percentile rewrites and matches the builtin") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT o_orderpriority, percentile(o_totalprice, array(0.25, 0.5, 0.75)) AS qs, " +
      "count(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    assert(!spark.sql(sql).queryExecution.executedPlan.toString.contains("percentile"),
      "array percentage should now ride the rewrite")
    assertSameRows(sql)
  }

  test("ARRAY percentile of an all-NULL group is NULL, not an array of NULLs") {
    import spark.implicits._
    Seq((1, Option.empty[Double]), (1, None), (2, Some(5.0)), (2, Some(7.0)))
      .toDF("g", "v").createOrReplaceTempView("eq_nulls_arr")
    val rows = spark.sql(
      "SELECT g, percentile(v, array(0.25, 0.75)) AS m FROM eq_nulls_arr GROUP BY g ORDER BY g")
      .collect()
    assert(rows(0).isNullAt(1), "all-NULL group must yield NULL (builtin semantics)")
    val arr = rows(1).getSeq[Double](1)
    assert(arr === Seq(5.5, 6.5))
  }

  // --------------------------------------------------- global (ungrouped, r8)

  test("global percentile rewrites: no buffer, results match (mixed + array)") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT percentile(o_totalprice, 0.5) AS med, " +
      "percentile(o_totalprice, array(0.1, 0.9)) AS deciles, " +
      "percentile(o_custkey, 0.25) AS pc, avg(o_totalprice) AS a, count(*) AS n FROM orders"
    assert(!spark.sql(sql).queryExecution.executedPlan.toString.contains("percentile"))
    assertSameRows(sql)
  }

  test("global percentile with ONLY percentiles in the SELECT") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT median(o_totalprice) AS m FROM orders"
    assert(!spark.sql(sql).queryExecution.executedPlan.toString.contains("percentile"))
    assertSameRows(sql)
  }

  test("global percentile over zero rows returns one NULL row like the builtin") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT percentile(o_totalprice, 0.5) AS m, " +
      "percentile(o_totalprice, array(0.25, 0.75)) AS ma FROM orders WHERE o_orderkey < 0"
    val rows = spark.sql(sql).collect()
    assert(rows.length === 1 && rows(0).isNullAt(0) && rows(0).isNullAt(1))
  }

  test("global plan: ONE executed range exchange (reused) and no data-sized SinglePartition") {
    Tables.registerAll(spark, sfDir)
    // AQE off so the executed plan is the static physical plan and exchange
    // reuse is visible as ReusedExchangeExec nodes
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
      val df = spark.sql(
        "SELECT percentile(o_totalprice, 0.5) AS m, count(*) AS n FROM orders")
      df.collect()
      val plan = df.queryExecution.executedPlan
      def collectAll[T](p: SparkPlan)(pf: PartialFunction[SparkPlan, T]): Seq[T] =
        p.collect(pf) ++ p.subqueries.flatMap(collectAll(_)(pf))
      val rangeEx = collectAll(plan) {
        case e: ShuffleExchangeExec if e.outputPartitioning.isInstanceOf[RangePartitioning] => e
      }
      assert(rangeEx.length === 1,
        s"the two consumers of the tagged histogram must share ONE range exchange:\n$plan")
      val reused = collectAll(plan) { case r: ReusedExchangeExec => r }
      assert(reused.nonEmpty, s"expected the second consumer to reuse the exchange:\n$plan")
      // every SinglePartition exchange must sit over bounded data: either a
      // partial aggregate (O(partitions) combiner rows) or the __pid-keyed
      // tiny totals frame — never raw histogram/table rows
      val singles = collectAll(plan) {
        case e: ShuffleExchangeExec if e.outputPartitioning == SinglePartition => e
      }
      def strip(p: SparkPlan): SparkPlan = p match {
        case w: org.apache.spark.sql.execution.WholeStageCodegenExec => strip(w.child)
        case i: org.apache.spark.sql.execution.InputAdapter => strip(i.child)
        case other => other
      }
      singles.foreach { e =>
        val boundedChild = strip(e.child) match {
          case _: HashAggregateExec | _: ObjectHashAggregateExec | _: SortAggregateExec => true
          case other => other.toString.contains("__pid")
        }
        assert(boundedChild,
          s"SinglePartition exchange over unbounded input:\n${e.child}")
      }
    } finally spark.conf.set("spark.sql.adaptive.enabled", "true")
  }

  test("global path under AQE: both range-exchange consumers coalesce identically (results match)") {
    // Round-10 pin of the documented invariant: the global form reads the
    // ONE range exchange from two consumers whose partition ids must
    // agree. Under AQE both reads go through AQEShuffleRead coalescing —
    // the coalesce decision is derived from the same materialized stage
    // statistics, so both consumers see the same partition map. This
    // asserts equality on a run where coalescing DEMONSTRABLY fired
    // (advisory size forced low so the final partition count is neither 1
    // nor the static 32); a divergence would corrupt the __pid join.
    Tables.registerAll(spark, sfDir)
    spark.conf.set("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "2048")
    try {
      val sql = "SELECT percentile(o_totalprice, 0.5) AS med, " +
        "percentile(o_totalprice, array(0.1, 0.9)) AS deciles, " +
        "percentile(o_custkey, 0.25) AS pc, count(*) AS n FROM orders"
      val df = withRule(on = true)(spark.sql(sql))
      val on = df.collect()
      val finalPlan = df.queryExecution.executedPlan.toString
      assert(finalPlan.contains("AQEShuffleRead coalesced"),
        s"the test must actually exercise AQE coalescing:\n$finalPlan")
      val off = withRule(on = false)(spark.sql(sql).collect())
      assert(on.length === 1 && off.length === 1)
      (0 until on.head.length).foreach { i =>
        (on.head.get(i), off.head.get(i)) match {
          case (x: Double, y: Double) => assert(math.abs(x - y) < 1e-9)
          case (x: scala.collection.Seq[_], y: scala.collection.Seq[_]) =>
            x.zip(y).foreach { case (xe: Double, ye: Double) =>
              assert(math.abs(xe - ye) < 1e-9) }
          case (x, y) => assert(x === y)
        }
      }
    } finally {
      spark.conf.unset("spark.sql.adaptive.coalescePartitions.parallelismFirst")
      spark.conf.unset("spark.sql.adaptive.advisoryPartitionSizeInBytes")
    }
  }

  // ------------------------------------------- DISTINCT and FILTER (r8)

  test("DISTINCT percentile rewrites (unit histogram counts) and matches the builtin") {
    Tables.registerAll(spark, sfDir)
    // o_custkey repeats across orders, so DISTINCT genuinely changes the
    // answer — a wrong unit-count rewrite could not pass both this and the
    // plain form's equality
    val sql = "SELECT o_orderpriority, percentile(DISTINCT o_custkey, 0.5) AS m, " +
      "count(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    assert(!spark.sql(sql).queryExecution.executedPlan.toString.contains("percentile"))
    assertSameRows(sql)
  }

  test("FILTER percentile rewrites (pre-histogram predicate) and matches the builtin") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT o_orderpriority, " +
      "percentile(o_totalprice, 0.5) FILTER (WHERE o_custkey % 2 = 0) AS m_even, " +
      "percentile(o_totalprice, 0.5) AS m_all, count(*) AS n " +
      "FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    assert(!spark.sql(sql).queryExecution.executedPlan.toString.contains("percentile"))
    assertSameRows(sql)
  }

  test("global DISTINCT + FILTER + array forms all rewrite and match") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT percentile(DISTINCT o_custkey, 0.5) AS md, " +
      "percentile(o_totalprice, array(0.25, 0.75)) FILTER (WHERE o_custkey > 50) AS fa, " +
      "avg(o_totalprice) AS a FROM orders"
    assert(!spark.sql(sql).queryExecution.executedPlan.toString.contains("percentile"))
    assertSameRows(sql)
  }

  test("FILTER that empties a group yields NULL like the builtin") {
    Tables.registerAll(spark, sfDir)
    val sql = "SELECT o_orderpriority, " +
      "percentile(o_totalprice, 0.5) FILTER (WHERE o_custkey < 0) AS m, " +
      "count(*) AS n FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority"
    val rows = spark.sql(sql).collect()
    assert(rows.nonEmpty && rows.forall(_.isNullAt(1)))
    assert(rows.forall(_.getLong(2) > 0))
  }

  // --------------------------------------------------------------- bail-outs

  test("bail-out keeps the original aggregate on a nondeterministic child") {
    Tables.registerAll(spark, sfDir)
    // the rewrite would re-evaluate rand() once per branch, losing
    // single-pass consistency (a nondeterministic MEASURE or FILTER is
    // rejected by the analyzer itself, so asPct's deterministic guards
    // stay defense-in-depth)
    val sql = "SELECT k, percentile(v, 0.5) AS m FROM " +
      "(SELECT o_orderpriority AS k, o_totalprice + rand() AS v FROM orders) GROUP BY k"
    val plan = spark.sql(sql).queryExecution.executedPlan.toString
    assert(plan.contains("percentile"), s"should NOT rewrite: $sql\n$plan")
  }

  test("median spelling routes through the rewrite too") {
    Tables.registerAll(spark, sfDir)
    val q = spark.sql(
      "SELECT o_orderpriority, median(o_totalprice) AS m FROM orders " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
    assert(!q.queryExecution.executedPlan.toString.contains("percentile"))
    assertSameRows(
      "SELECT o_orderpriority, median(o_totalprice) AS m FROM orders " +
        "GROUP BY o_orderpriority ORDER BY o_orderpriority")
  }
}
