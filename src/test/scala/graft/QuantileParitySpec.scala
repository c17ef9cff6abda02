package graft

import org.scalatest.funsuite.AnyFunSuite

/** DuckDB-parity quantile family (functions/QuantileAggs.scala): the
  * expected values below are pinned from differential probes against
  * python-duckdb 1.0.0 (the driver's oracle engine) — index formula
  * max(1, ceil(q·n)), type preservation, DECIMAL-discrete median, DECIMAL
  * truncated-interpolation quantile_cont. Both execution paths are
  * checked: the ExactQuantileRule histogram shape (default) and the
  * QuantileFallbackRule collect_list composite (rewrite disabled). */
class QuantileParitySpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def ensureFns(): Unit = Tables.registerAll(spark, SparkTestSession.sfDir)

  private def withRule[T](on: Boolean)(f: => T): T = {
    spark.conf.set("spark.graft.exactQuantileRewrite", on.toString)
    try f finally spark.conf.set("spark.graft.exactQuantileRewrite", "true")
  }

  private def bothPaths(sql: String)(check: Array[org.apache.spark.sql.Row] => Unit): Unit = {
    check(withRule(on = true)(spark.sql(sql).collect()))
    check(withRule(on = false)(spark.sql(sql).collect()))
  }

  test("quantile_disc index formula matches the duckdb probe grid (n=4, n=5)") {
    ensureFns()
    // duckdb 1.0.0: n=4 [10,20,30,40] → q .0/.25→10, .3/.5→20, .75→30, .76/1→40
    val expected4 = Seq(0.0 -> 10, 0.25 -> 10, 0.3 -> 20, 0.5 -> 20,
      0.75 -> 30, 0.76 -> 40, 1.0 -> 40)
    for ((q, want) <- expected4) bothPaths(
      s"SELECT quantile_disc(x, $q) AS v FROM VALUES (10),(20),(30),(40) t(x)") { rows =>
      assert(rows.head.get(0) === want, s"q=$q")
      assert(rows.head.get(0).isInstanceOf[Integer], "INT input stays INT")
    }
    for ((q, want) <- Seq(0.4 -> 20, 0.5 -> 30, 0.6 -> 30)) bothPaths(
      s"SELECT quantile_disc(x, $q) AS v FROM VALUES (10),(20),(30),(40),(50) t(x)") {
      rows => assert(rows.head.get(0) === want, s"q=$q")
    }
  }

  test("quantile_disc preserves DECIMAL / DATE / STRING types; quantile is an alias") {
    ensureFns()
    bothPaths("SELECT quantile_disc(x, 0.5) AS v FROM VALUES " +
      "(CAST(1.50 AS DECIMAL(5,2))),(CAST(2.50 AS DECIMAL(5,2))) t(x)") { rows =>
      assert(rows.head.getDecimal(0).toPlainString === "1.50")
    }
    bothPaths("SELECT quantile_disc(x, 0.5) AS v FROM VALUES " +
      "(DATE '2020-01-01'),(DATE '2020-01-03') t(x)") { rows =>
      assert(rows.head.getDate(0).toString === "2020-01-01")
    }
    bothPaths("SELECT quantile_disc(x, 0.5) AS v FROM VALUES ('a'),('b'),('c') t(x)") {
      rows => assert(rows.head.getString(0) === "b")
    }
    bothPaths("SELECT quantile(x, 0.3) AS v FROM VALUES (10),(20),(30),(40) t(x)") {
      rows => assert(rows.head.get(0) === 20)
    }
    // 1-arg default q = 0.5
    bothPaths("SELECT quantile_disc(x) AS v FROM VALUES (1),(2),(3),(4) t(x)") {
      rows => assert(rows.head.get(0) === 2)
    }
  }

  test("quantile_disc list-q returns a list of the input type (duckdb probe)") {
    ensureFns()
    bothPaths("SELECT quantile_disc(x, array(0.25D, 0.5D, 1.0D)) AS v " +
      "FROM VALUES (10),(20),(30),(40) t(x)") { rows =>
      assert(rows.head.getSeq[Int](0) === Seq(10, 20, 40))
    }
  }

  test("quantile_disc: NULLs skipped, all-NULL/empty group is NULL") {
    ensureFns()
    bothPaths("SELECT quantile_disc(x, 0.5) AS v FROM VALUES (10),(NULL),(20) t(x)") {
      rows => assert(rows.head.get(0) === 10) // duckdb probe: n=2 lower
    }
    bothPaths("SELECT k, quantile_disc(x, 0.5) AS v FROM VALUES " +
      "(1, 10),(1, 30),(2, CAST(NULL AS INT)) t(k, x) GROUP BY k ORDER BY k") { rows =>
      assert(rows(0).get(1) === 10 && rows(1).isNullAt(1))
    }
    bothPaths("SELECT quantile_disc(x, array(0.5D)) AS v FROM VALUES " +
      "(CAST(NULL AS INT)) t(x)") { rows =>
      assert(rows.head.isNullAt(0), "all-NULL list-q is NULL, not [NULL]")
    }
  }

  test("quantile_disc grouped over the tables: DISTINCT and FILTER forms") {
    ensureFns()
    // reference per group computed in-test with the pinned index formula
    def expect(vals: Seq[Int], q: Double): Int = {
      val s = vals.sorted
      s(math.max(1, math.ceil(q * s.size).toInt) - 1)
    }
    val base = spark.sql(
      "SELECT o_orderpriority AS k, CAST(o_custkey AS INT) AS x FROM orders")
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
    bothPaths("SELECT o_orderpriority AS k, " +
      "quantile_disc(CAST(o_custkey AS INT), 0.25) AS v, " +
      "quantile_disc(DISTINCT CAST(o_custkey AS INT), 0.25) AS vd, " +
      "quantile_disc(CAST(o_custkey AS INT), 0.25) " +
      "  FILTER (WHERE o_custkey % 2 = 0) AS vf " +
      "FROM orders GROUP BY k ORDER BY k") { rows =>
      rows.foreach { r =>
        val vals = base.filter(_._1 == r.getString(0)).map(_._2)
        assert(r.getInt(1) === expect(vals, 0.25), s"plain ${r.getString(0)}")
        assert(r.getInt(2) === expect(vals.distinct, 0.25), s"distinct ${r.getString(0)}")
        assert(r.getInt(3) === expect(vals.filter(_ % 2 == 0), 0.25), s"filter ${r.getString(0)}")
      }
    }
  }

  test("median: DECIMAL is discrete-lower and keeps its type; DOUBLE interpolates") {
    ensureFns()
    // duckdb probes: median of DECIMAL [1,4] = 1 (not 2.5); [1,2,4] = 2
    bothPaths("SELECT median(x) AS v FROM VALUES " +
      "(CAST(1 AS DECIMAL(5,0))),(CAST(4 AS DECIMAL(5,0))) t(x)") { rows =>
      assert(rows.head.getDecimal(0).intValueExact === 1)
    }
    bothPaths("SELECT median(x) AS v FROM VALUES " +
      "(CAST(1 AS DECIMAL(5,0))),(CAST(2 AS DECIMAL(5,0))),(CAST(4 AS DECIMAL(5,0))) t(x)") {
      rows => assert(rows.head.getDecimal(0).intValueExact === 2)
    }
    bothPaths("SELECT median(x) AS v FROM VALUES (1.0D),(2.0D) t(x)") { rows =>
      assert(rows.head.getDouble(0) === 1.5)
    }
    bothPaths("SELECT median(x) AS v FROM VALUES (1),(2) t(x)") { rows =>
      assert(rows.head.getDouble(0) === 1.5) // INT interpolates to DOUBLE
    }
  }

  test("quantile_cont: DECIMAL truncates the exact interpolation toward zero") {
    ensureFns()
    // duckdb probes (the negative rows are where rounding and
    // increment-truncation hypotheses both failed)
    val cases = Seq(
      ("(CAST(-2.51 AS DECIMAL(9,2))),(CAST(2.98 AS DECIMAL(9,2)))", 0.1, "-1.96"),
      ("(CAST(1 AS DECIMAL(5,0))),(CAST(2 AS DECIMAL(5,0)))", 0.75, "1"),
      ("(CAST(2 AS DECIMAL(5,0))),(CAST(3 AS DECIMAL(5,0)))", 0.5, "2"),
      ("(CAST(1.11 AS DECIMAL(5,2))),(CAST(1.12 AS DECIMAL(5,2)))", 0.5, "1.11"),
      ("(CAST(1.50 AS DECIMAL(5,2))),(CAST(2.50 AS DECIMAL(5,2)))", 0.5, "2.00"))
    for ((vals, q, want) <- cases) bothPaths(
      s"SELECT quantile_cont(x, $q) AS v FROM VALUES $vals t(x)") { rows =>
      assert(rows.head.getDecimal(0).toPlainString === want, s"$vals q=$q")
    }
    // non-DECIMAL: unchanged interpolation (Spark percentile semantics)
    bothPaths("SELECT quantile_cont(x, 0.25) AS v FROM VALUES (1.0D),(2.0D) t(x)") {
      rows => assert(rows.head.getDouble(0) === 1.25)
    }
    bothPaths("SELECT quantile_cont(x, array(0.25D, 0.5D)) AS v " +
      "FROM VALUES (1.0D),(2.0D),(3.0D) t(x)") { rows =>
      assert(rows.head.getSeq[Double](0) === Seq(1.5, 2.0))
    }
  }

  test("round 14: median over VARCHAR selects, DATE/TIMESTAMP interpolate, " +
      "quantile_cont rides wide DECIMAL and timestamps (duckdb-pinned)") {
    ensureFns()
    // duckdb: median(['a','b','c','d']) = 'b' (discrete-lower, VARCHAR out)
    bothPaths("SELECT median(x) AS v FROM VALUES ('a'),('b'),('c'),('d') t(x)") {
      rows => assert(rows.head.getString(0) === "b")
    }
    bothPaths("SELECT median(x) AS v FROM VALUES ('b'),('a'),('c') t(x)") {
      rows => assert(rows.head.getString(0) === "b")
    }
    // duckdb: the .5-microsecond midpoint (norm-stripped in the probe grid,
    // pinned here): median of 00:00:00 and next-day 00:00:01 = 12:00:00.5
    bothPaths("SELECT CAST(median(x) AS STRING) AS v FROM VALUES " +
      "(TIMESTAMP '2024-01-01 00:00:00'),(TIMESTAMP '2024-01-02 00:00:01') t(x)") {
      rows => assert(rows.head.getString(0) === "2024-01-01 12:00:00.5")
    }
    // DATE input returns an interpolated TIMESTAMP (duckdb-probed)
    bothPaths("SELECT CAST(median(x) AS STRING) AS v FROM VALUES " +
      "(DATE '2024-01-01'),(DATE '2024-01-02') t(x)") {
      rows => assert(rows.head.getString(0) === "2024-01-01 12:00:00")
    }
    // wide DECIMAL: duckdb interpolates over the unscaled value cast to
    // DOUBLE — both pinned results reproduce its rounding exactly
    bothPaths("SELECT CAST(quantile_cont(x, 0.3) AS STRING) AS v FROM VALUES " +
      "(CAST(1.5 AS DECIMAL(25,2))),(CAST(4.25 AS DECIMAL(25,2))),(CAST(9 AS DECIMAL(25,2))) t(x)") {
      rows => assert(rows.head.getString(0) === "3.15")
    }
    bothPaths("SELECT CAST(quantile_cont(x, 0.25) AS STRING) AS v FROM VALUES " +
      "(CAST('123456789012345678901.123' AS DECIMAL(38,3)))," +
      "(CAST('123456789012345678909.125' AS DECIMAL(38,3))) t(x)") {
      rows => assert(rows.head.getString(0) === "123456789012345685803.008")
    }
    bothPaths("SELECT CAST(quantile_cont(x, 0.5) AS STRING) AS v FROM VALUES " +
      "(TIMESTAMP '2024-01-01 00:00:00'),(TIMESTAMP '2024-01-02 00:00:01') t(x)") {
      rows => assert(rows.head.getString(0) === "2024-01-01 12:00:00.5")
    }
    // grouped + all-NULL-group stitching for the new types
    bothPaths("SELECT k, median(x) AS v FROM VALUES " +
      "(1, 'a'),(1, 'b'),(1, 'c'),(1, 'd'),(2, NULL) t(k, x) " +
      "GROUP BY k ORDER BY k") { rows =>
      assert(rows(0).getString(1) === "b")
      assert(rows(1).isNullAt(1))
    }
    bothPaths("SELECT k, CAST(median(x) AS STRING) AS v FROM VALUES " +
      "(1, TIMESTAMP '2024-01-01 00:00:00'),(1, TIMESTAMP '2024-01-02 00:00:00')," +
      "(2, TIMESTAMP '2030-05-05 10:00:00') t(k, x) GROUP BY k ORDER BY k") { rows =>
      assert(rows(0).getString(1) === "2024-01-01 12:00:00")
      assert(rows(1).getString(1) === "2030-05-05 10:00:00")
    }
    // array-q over timestamps keeps the list shape
    bothPaths("SELECT CAST(quantile_cont(x, array(0.0D, 0.5D))[1] AS STRING) AS v " +
      "FROM VALUES (TIMESTAMP '2024-01-01 00:00:00')," +
      "(TIMESTAMP '2024-01-03 00:00:00') t(x)") {
      rows => assert(rows.head.getString(0) === "2024-01-02 00:00:00")
    }
  }

  test("plan shapes: histogram by default, collect_list composite on bail") {
    ensureFns()
    val sql = "SELECT o_orderpriority, quantile_disc(o_custkey, 0.5) AS v " +
      "FROM orders GROUP BY o_orderpriority"
    val histPlan = withRule(on = true)(
      spark.sql(sql).queryExecution.executedPlan.toString)
    assert(!histPlan.contains("collect_list") && !histPlan.contains("percentile"),
      s"default path must be the histogram shape:\n$histPlan")
    assert(histPlan.contains("Window"), "running-count window expected")
    val fbPlan = withRule(on = false)(
      spark.sql(sql).queryExecution.executedPlan.toString)
    assert(fbPlan.contains("collect_list"),
      s"disabled rewrite must fall back to the composite:\n$fbPlan")
    // DECIMAL quantile_cont routes through the histogram too (round-13:
    // the collect_list fallback is per-group data-sized state — the exact
    // memory cliff the rule exists to remove)
    val decSql = "SELECT l_returnflag, " +
      "quantile_cont(CAST(l_quantity AS DECIMAL(12,2)), 0.25) AS qc " +
      "FROM lineitem GROUP BY l_returnflag"
    val decPlan = withRule(on = true)(
      spark.sql(decSql).queryExecution.executedPlan.toString)
    assert(!decPlan.contains("collect_list") && !decPlan.contains("percentile"),
      s"decimal cont must use the histogram shape:\n$decPlan")
    // entropy: two plain aggregations off the histogram — NO window, NO
    // collected list anywhere in the plan (the 100 TB shape)
    val entSql = "SELECT l_returnflag, entropy(l_linestatus) AS h " +
      "FROM lineitem GROUP BY l_returnflag"
    val entPlan = withRule(on = true)(
      spark.sql(entSql).queryExecution.executedPlan.toString)
    assert(!entPlan.contains("collect_list") && !entPlan.contains("Window"),
      s"entropy must be pure aggregation:\n$entPlan")
  }

  test("quantile_disc in window position computes (round 14; QuantileWindowSpec pins values)") {
    ensureFns()
    // was a loud-reject through round 13; the whole-partition frame now
    // rides the group-join stitch — here just pin that it executes and
    // agrees with the aggregate-position answer per group
    val win = spark.sql("SELECT DISTINCT o_orderpriority AS k, " +
      "quantile_disc(o_custkey, 0.5) OVER (PARTITION BY o_orderpriority) AS v " +
      "FROM orders").collect().map(r => r.getString(0) -> r.get(1)).toMap
    val agg = spark.sql("SELECT o_orderpriority AS k, " +
      "quantile_disc(o_custkey, 0.5) AS v FROM orders GROUP BY 1")
      .collect().map(r => r.getString(0) -> r.get(1)).toMap
    assert(win === agg)
  }

  test("quantile positions must be constants in [0, 1]") {
    ensureFns()
    val bad = intercept[Exception] {
      spark.sql("SELECT quantile_disc(o_custkey, 1.5) AS v FROM orders").collect()
    }
    assert(bad.getMessage.contains("quantile"), bad.getMessage)
    val nonConst = intercept[Exception] {
      spark.sql("SELECT quantile_disc(o_custkey, o_totalprice) AS v FROM orders " +
        "GROUP BY o_orderpriority").collect()
    }
    assert(nonConst.getMessage.nonEmpty)
  }
}
