package graft

import org.scalatest.funsuite.AnyFunSuite

/** Quantile aggregates in WINDOW position (round 14,
  * QuantileFallbackRule.rewriteWindow) — DuckDB accepts every aggregate
  * as a window function; expected values below are pinned from
  * python-duckdb 1.0.0 probes this session.
  *
  *  - whole-partition frames (no ORDER BY) stitch the aggregate-position
  *    marker — i.e. the ExactQuantileRule histogram shape — back under
  *    the window via a group join (plan-asserted: no per-row collect);
  *  - ordered/sliding frames ride WindowQuantileHist (round 16): an
  *    O(distinct) run-length histogram window aggregate, plan-asserted
  *    collect_list-free below. Only DISTINCT/FILTER markers, non-atomic
  *    types and unfoldable percentages keep the collect_list composite. */
class QuantileWindowSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private def ensureFns(): Unit = Tables.registerAll(spark, SparkTestSession.sfDir)

  private val t =
    """(VALUES ('a',1,10),('a',2,20),('a',3,30),('a',4,NULL),
      |        ('b',1,5),('b',2,7)) v(p,o,x)""".stripMargin

  test("whole-partition frame: median/quantile_disc via the group-join stitch") {
    ensureFns()
    val df = spark.sql(
      s"""SELECT p, o, median(x) OVER (PARTITION BY p) AS m
         |FROM $t ORDER BY p, o""".stripMargin)
    // duckdb: a → median([10,20,30]) = 20.0 on every row; b → 6.0
    assert(df.collect().map(r => (r.getString(0), r.get(2))).toSeq ===
      Seq(("a", 20.0), ("a", 20.0), ("a", 20.0), ("a", 20.0),
        ("b", 6.0), ("b", 6.0)))
    // the whole-frame path must NOT collect per row: no CollectList in
    // the optimized plan (the histogram shape has none), and a join
    // stitches the group statistic back
    val opt = df.queryExecution.optimizedPlan
    assert(!opt.exists(_.expressions.exists(_.exists {
      case _: org.apache.spark.sql.catalyst.expressions.aggregate.CollectList => true
      case _ => false
    })), "whole-partition window quantile must ride the histogram path")
    assert(opt.exists(_.isInstanceOf[
      org.apache.spark.sql.catalyst.plans.logical.Join]))
  }

  test("empty OVER (): global stitch, one-row broadcast") {
    ensureFns()
    val rows = spark.sql(
      s"""SELECT median(x) OVER () AS m, quantile_disc(x, 0.25) OVER () AS qd
         |FROM $t ORDER BY m, qd""".stripMargin).collect()
    // duckdb: median([5,7,10,20,30]) = 10.0; disc(.25): ceil(1.25)=2 → 7
    assert(rows.length === 6)
    assert(rows.forall(r => r.getDouble(0) === 10.0 && r.getInt(1) === 7))
  }

  test("running RANGE frame: discrete/interpolated quantiles with peers") {
    ensureFns()
    val rows = spark.sql(
      s"""SELECT p, o,
         |  quantile_disc(x, 0.5) OVER (PARTITION BY p ORDER BY o) AS qd,
         |  quantile_cont(x, 0.25) OVER (PARTITION BY p ORDER BY o) AS qc
         |FROM $t ORDER BY p, o""".stripMargin).collect()
    // duckdb (NULL ignored; frame = prefix incl. peers):
    // a: o1 [10]→(10,10.0); o2 [10,20]→(10,12.5); o3 →(20,15.0); o4 same
    // b: o1 [5]→(5,5.0); o2 [5,7]→(5,5.5)
    val got = rows.map(r => (r.getString(0), r.getInt(1), r.get(2), r.get(3)))
    assert(got.toSeq === Seq(
      ("a", 1, 10, 10.0), ("a", 2, 10, 12.5), ("a", 3, 20, 15.0),
      ("a", 4, 20, 15.0), ("b", 1, 5, 5.0), ("b", 2, 5, 5.5)))
  }

  test("sliding ROWS frame, VARCHAR median, array percentages, entropy") {
    ensureFns()
    val slide = spark.sql(
      s"""SELECT p, o, median(x)
         |  OVER (PARTITION BY p ORDER BY o
         |        ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS m
         |FROM $t ORDER BY p, o""".stripMargin).collect()
    assert(slide.map(_.get(2)).toSeq ===
      Seq(10.0, 15.0, 25.0, 30.0, 5.0, 6.0))
    val vc = spark.sql(
      """SELECT o, median(s) OVER (ORDER BY o) AS m
        |FROM (VALUES (1,'b'),(2,'a'),(3,'c')) v(o,s) ORDER BY o""".stripMargin)
      .collect()
    // duckdb: VARCHAR median selects discretely, keeping VARCHAR
    assert(vc.map(_.getString(1)).toSeq === Seq("b", "a", "b"))
    val arr = spark.sql(
      s"""SELECT o, quantile_disc(x, array(0.25D, 0.75D)) OVER (ORDER BY o) AS qa
         |FROM $t WHERE p = 'a' ORDER BY o""".stripMargin).collect()
    assert(arr.map(_.getSeq[Int](1).toSeq).toSeq ===
      Seq(Seq(10, 10), Seq(10, 20), Seq(10, 30), Seq(10, 30)))
    val h = spark.sql(
      """SELECT o, entropy(y) OVER (ORDER BY o) AS h
        |FROM (VALUES (1,'u'),(2,'u'),(3,'v')) v(o,y) ORDER BY o""".stripMargin)
      .collect()
    assert(h.map(_.getDouble(1)).toSeq.zip(
      Seq(0.0, 0.0, 0.9182958340544893)).forall {
      case (a, b) => math.abs(a - b) < 1e-12 })
  }

  test("ordered/sliding frames plan the histogram window aggregate, no per-row collect_list") {
    ensureFns()
    // every marker family over a running frame + a sliding ROWS frame:
    // the optimized plan must carry graft_window_quantile and NO
    // CollectList (the O(frame)-array-per-row composite this replaces)
    val df = spark.sql(
      s"""SELECT p, o,
         |  quantile_disc(x, 0.5) OVER (PARTITION BY p ORDER BY o) AS qd,
         |  quantile_cont(CAST(x AS DECIMAL(10,2)), 0.25)
         |    OVER (PARTITION BY p ORDER BY o) AS qcd,
         |  entropy(x) OVER (PARTITION BY p ORDER BY o
         |    ROWS BETWEEN 1 PRECEDING AND CURRENT ROW) AS h
         |FROM $t""".stripMargin)
    val opt = df.queryExecution.optimizedPlan
    assert(!opt.toString.contains("collect_list"),
      s"ordered frames must ride the histogram aggregate:\n$opt")
    assert(opt.toString.contains("graft_window_quantile"), opt.toString)
    assert(df.count() === 6) // and it executes
    // the composite remains for shapes the histogram cannot take:
    // DISTINCT markers (window DISTINCT is rejected loudly by Spark —
    // same behavior as before), and non-atomic measures fall back
    val ts = spark.sql(
      s"""SELECT o, median(d) OVER (ORDER BY o) AS m
         |FROM (VALUES (1, DATE '2024-01-01'), (2, DATE '2024-01-03')) v(o, d)
         |ORDER BY o""".stripMargin).collect()
    // duckdb median(DATE) interpolates in epoch space → TIMESTAMP
    assert(ts.map(_.get(1).toString).toSeq ===
      Seq("2024-01-01 00:00:00.0", "2024-01-02 00:00:00.0"))
  }

  test("stacked marker windows (grouped + global) BOTH ride the histogram") {
    ensureFns()
    // two Window nodes stack; the second stitch's aggregate must strip
    // the first stitch from its child (q126 plan audit: aggregating
    // THROUGH the other stitch put its SparkPartitionID-bearing
    // histogram inside the subtree, failed ExactQuantileRule's
    // deterministic-tree guard, and silently degraded to collect_list)
    val df = spark.sql(
      s"""SELECT quantile_disc(x, 0.25) OVER (PARTITION BY p) AS qd,
         |  median(o) OVER () AS m
         |FROM $t""".stripMargin)
    assert(!df.queryExecution.optimizedPlan.toString.contains("collect_list"),
      "stacked stitches must not fall back to the collect_list composite")
    val rows = df.collect().map(r => (r.get(0), r.get(1))).toSet
    // duckdb: a-group disc(.25) over [10,20,30] = 10; b-group [5,7] = 5;
    // global median of o-values [1,2,3,4,1,2] = 2.0
    assert(rows === Set((10, 2.0), (5, 2.0)))
  }

  test("windowed quantiles mix with plain window aggregates in one OVER set") {
    ensureFns()
    val rows = spark.sql(
      s"""SELECT p, o,
         |  median(x) OVER (PARTITION BY p) AS m,
         |  sum(x) OVER (PARTITION BY p) AS s,
         |  quantile_disc(x, 1.0) OVER (PARTITION BY p ORDER BY o) AS qmax
         |FROM $t ORDER BY p, o""".stripMargin).collect()
    assert(rows.map(r => (r.get(2), r.get(3), r.get(4))).toSeq === Seq(
      (20.0, 60L, 10), (20.0, 60L, 20), (20.0, 60L, 30), (20.0, 60L, 30),
      (6.0, 12L, 5), (6.0, 12L, 7)))
  }
}
