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

  test("RANGE [CUR, UNB FOLLOWING] EXCLUDE CURRENT ROW subtracts self from the FRAME, not the partition") {
    Tables.registerAll(spark, sfDir)
    // the total−prefix identity is peer-group-only; this frame shape must
    // come out as total − prefix + peers − self (three incremental
    // windows, one sort) — the raw identity silently gave partition−self
    def sql(order: String) =
      s"""SELECT o_orderkey,
         |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY $order
         |    RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS s,
         |  count(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY $order
         |    RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS c,
         |  avg(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY $order
         |    RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS a
         |FROM orders""".stripMargin
    def ref(order: String) = spark.sql(
      s"""SELECT o_orderkey,
         |  CASE WHEN count(o_totalprice) OVER w > 1
         |       THEN (sum(o_totalprice) OVER w) - o_totalprice END AS s,
         |  (count(o_totalprice) OVER w) - 1 AS c,
         |  CASE WHEN count(o_totalprice) OVER w > 1
         |       THEN CAST((sum(o_totalprice) OVER w) - o_totalprice AS DOUBLE)
         |            / ((count(o_totalprice) OVER w) - 1) END AS a
         |FROM orders
         |WINDOW w AS (PARTITION BY o_custkey ORDER BY $order
         |             RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin)
    // single-key (date ties give non-trivial peer groups) and multi-key
    for (order <- Seq("o_orderdate", "o_orderdate, o_orderpriority")) {
      val rewritten = WindowExclude.rewrite(sql(order))
      assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
      // incremental spelling: the O(n²) [CUR, UNB] frame is never emitted
      assert(!rewritten.toUpperCase.contains("CURRENT ROW AND UNBOUNDED"), rewritten)
      // ulp-tolerant join compare: the identity's DOUBLE accumulation
      // order differs from the reference's frame−self by last-digit ulps
      val diff = spark.sql(rewritten).as("g")
        .join(ref(order).as("r"), "o_orderkey")
        .selectExpr("g.c AS gc", "r.c AS rc",
          "CAST(g.s AS DOUBLE) AS gs", "CAST(r.s AS DOUBLE) AS rs",
          "CAST(g.a AS DOUBLE) AS ga", "CAST(r.a AS DOUBLE) AS ra")
        .where("""NOT (gc <=> rc)
          OR (NOT (gs <=> rs) AND (gs IS NULL OR rs IS NULL OR abs(gs - rs) > 1e-4))
          OR (NOT (ga <=> ra) AND (ga IS NULL OR ra IS NULL OR abs(ga - ra) > 1e-4))""")
      assert(diff.count() == 0, order)
    }
  }

  test("UNBOUNDED FOLLOWING halves are emitted on the reversed ordering (no O(n²) frames)") {
    // a ROWS frame whose upper bound is UNBOUNDED FOLLOWING is recomputed
    // from scratch per row by Spark (UnboundedFollowingWindowFunctionFrame
    // — a q134 sf10 sweep sat in it for half an hour); the rewriter must
    // spell those pieces on the sequence-reversed ordering instead
    val sql =
      """SELECT
        |  sum(x) OVER (PARTITION BY p ORDER BY y, z ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS s,
        |  last_value(x IGNORE NULLS) OVER (PARTITION BY p ORDER BY y, z ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS ln,
        |  first_value(x) OVER (PARTITION BY p ORDER BY y ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS f
        |FROM t""".stripMargin
    val rw = WindowExclude.rewrite(sql).toUpperCase
    assert(!rw.contains("EXCLUDE"), rw)
    assert(!rw.contains("FOLLOWING AND UNBOUNDED FOLLOWING") &&
      !rw.contains("CURRENT ROW AND UNBOUNDED FOLLOWING"), rw)
    assert(rw.contains("DESC NULLS FIRST"), rw) // the mirrored ordering
  }

  test("flipped UNBOUNDED FOLLOWING pieces match a native reference") {
    Tables.registerAll(spark, sfDir)
    val rw = WindowExclude.rewrite(
      """SELECT o_orderkey,
        |  sum(o_totalprice) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS s,
        |  last_value(o_orderpriority) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING EXCLUDE CURRENT ROW) AS lv
        |FROM orders""".stripMargin)
    assert(!rw.toUpperCase.contains("EXCLUDE"), rw)
    // reference pays the O(n²) frame — fine at fixture size. The excluded
    // remainder's last equals the frame's last whenever the frame has
    // rows beyond the current one.
    val ref = spark.sql(
      """SELECT o_orderkey,
        |  CASE WHEN count(*) OVER w > 1
        |       THEN (sum(o_totalprice) OVER w) - o_totalprice END AS s,
        |  CASE WHEN count(*) OVER w > 1
        |       THEN last_value(o_orderpriority) OVER w END AS lv
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)""".stripMargin)
    val diff = spark.sql(rw).as("g").join(ref.as("r"), "o_orderkey")
      .selectExpr("CAST(g.s AS DOUBLE) AS gs", "CAST(r.s AS DOUBLE) AS rs",
        "g.lv AS gl", "r.lv AS rl")
      .where("""NOT (gl <=> rl)
        OR (NOT (gs <=> rs) AND (gs IS NULL OR rs IS NULL OR abs(gs - rs) > 1e-4))""")
    assert(diff.count() == 0)
  }

  test("EXCLUDE NO OTHERS is stripped, TIES/GROUP and RANGE pass through") {
    val noOthers = WindowExclude.rewrite(
      "SELECT sum(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE NO OTHERS) FROM t")
    assert(!noOthers.toUpperCase.contains("EXCLUDE"))
    assert(noOthers.toUpperCase.contains("ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING"))
    // k-offset TIES with min passes through (no subtraction form exists);
    // the sum spelling is REWRITTEN since round 11 (k-offset path)
    val ties =
      "SELECT min(x) OVER (ORDER BY y ROWS BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) FROM t"
    assert(WindowExclude.rewrite(ties) == ties)
    assert(!WindowExclude.rewrite(ties.replace("min(", "sum("))
      .toUpperCase.contains("EXCLUDE"))
    // RANGE-mode EXCLUDE CURRENT ROW rides the subtract path since
    // round 15 (frame − the current row's own contribution); min/max
    // still pass through loudly (a peer-value row cannot be cut out of
    // a value range)
    val range =
      "SELECT sum(x) OVER (ORDER BY y RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING EXCLUDE CURRENT ROW) FROM t"
    val rr = WindowExclude.rewrite(range)
    assert(!rr.toUpperCase.contains("EXCLUDE"), rr)
    assert(rr.toUpperCase.contains("RANGE BETWEEN 1 PRECEDING AND 1 FOLLOWING"), rr)
    val rangeMin = range.replace("sum(", "min(")
    assert(WindowExclude.rewrite(rangeMin) == rangeMin)
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

  // ------------------------------- EXCLUDE TIES / EXCLUDE GROUP (round 10)

  test("EXCLUDE TIES/GROUP match a self-join reference on duplicate order keys") {
    Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT o_orderkey,
        |  CAST(sum(o_totalprice) OVER wt AS DOUBLE) AS ties_sum,
        |  CAST(count(*) OVER wt AS BIGINT) AS ties_cnt,
        |  CAST(avg(o_totalprice) OVER wt AS DOUBLE) AS ties_avg,
        |  CAST(min(o_totalprice) OVER wt AS DOUBLE) AS ties_min,
        |  CAST(sum(o_totalprice) OVER wg AS DOUBLE) AS grp_sum,
        |  CAST(max(o_totalprice) OVER wg AS DOUBLE) AS grp_max,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS full_grp_cnt,
        |  CAST(sum(o_totalprice) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate
        |    RANGE BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING
        |    EXCLUDE TIES) AS DOUBLE) AS suffix_ties_sum
        |FROM orders
        |WINDOW wt AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |              EXCLUDE TIES),
        |       wg AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |              RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
        |              EXCLUDE GROUP)""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    assert(rewritten.contains("dense_rank() OVER"), rewritten)
    val got = spark.sql(rewritten)
    // reference: one self-join on the partition key, per-row conditional
    // aggregates over the peer relation (below / not-equal / above)
    val ref = spark.sql(
      """SELECT a.o_orderkey,
        |  CAST(coalesce(sum(CASE WHEN b.o_orderdate < a.o_orderdate
        |         THEN b.o_totalprice END), 0) + a.o_totalprice AS DOUBLE) AS ties_sum,
        |  count(CASE WHEN b.o_orderdate < a.o_orderdate THEN 1 END) + 1 AS ties_cnt,
        |  CAST((coalesce(sum(CASE WHEN b.o_orderdate < a.o_orderdate
        |          THEN b.o_totalprice END), 0) + a.o_totalprice) AS DOUBLE)
        |    / CAST(count(CASE WHEN b.o_orderdate < a.o_orderdate THEN 1 END) + 1
        |        AS DOUBLE) AS ties_avg,
        |  CAST(CASE WHEN min(CASE WHEN b.o_orderdate < a.o_orderdate
        |              THEN b.o_totalprice END) IS NULL THEN a.o_totalprice
        |       ELSE least(min(CASE WHEN b.o_orderdate < a.o_orderdate
        |              THEN b.o_totalprice END), a.o_totalprice) END AS DOUBLE) AS ties_min,
        |  CAST(sum(CASE WHEN b.o_orderdate < a.o_orderdate
        |         THEN b.o_totalprice END) AS DOUBLE) AS grp_sum,
        |  CAST(max(CASE WHEN b.o_orderdate < a.o_orderdate
        |         THEN b.o_totalprice END) AS DOUBLE) AS grp_max,
        |  count(CASE WHEN b.o_orderdate <> a.o_orderdate THEN 1 END) AS full_grp_cnt,
        |  CAST(coalesce(sum(CASE WHEN b.o_orderdate > a.o_orderdate
        |         THEN b.o_totalprice END), 0) + a.o_totalprice AS DOUBLE) AS suffix_ties_sum
        |FROM orders a JOIN orders b ON a.o_orderpriority = b.o_orderpriority
        |GROUP BY a.o_orderkey, a.o_orderdate, a.o_totalprice""".stripMargin)
    // per-column comparison with a float tolerance (ties_avg differs in
    // ulps between the split form and the self-join form, so a rounded
    // exceptAll can flip on .0005 boundaries); NULLs must agree exactly
    import org.apache.spark.sql.functions.{abs, col}
    val cols = Seq("ties_sum", "ties_cnt", "ties_avg", "ties_min",
      "grp_sum", "grp_max", "full_grp_cnt", "suffix_ties_sum")
    val g = got.select(col("o_orderkey") +: cols.map(c => col(c).as("g_" + c)): _*)
    val r = ref.select(col("o_orderkey") +: cols.map(c => col(c).as("r_" + c)): _*)
    val joined = g.join(r, "o_orderkey")
    assert(joined.count() === got.count() && got.count() > 0)
    val bad = joined.filter(cols.map(c =>
      !(col("g_" + c) <=> col("r_" + c)) &&
        !(col("g_" + c).isNotNull && col("r_" + c).isNotNull &&
          abs(col("g_" + c).cast("double") - col("r_" + c).cast("double")) < 1e-3)
    ).reduce(_ || _))
    assert(bad.count() === 0, bad.collect().take(5).mkString("\n"))
    // sanity: at least one row must have real peers, or TIES ≡ CURRENT ROW
    // and the test proves nothing
    assert(got.filter(col("full_grp_cnt") > 0).count() > 0)
  }

  test("TIES/GROUP ownership: CAST wrapping and scalar-subquery siblings resolve to the right SELECT") {
    Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT o_orderkey,
        |  (SELECT max(n_nationkey) FROM nation) AS nmax,
        |  CAST(min(o_totalprice) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate EXCLUDE TIES) AS DOUBLE) AS s
        |FROM orders WHERE o_orderkey <= 200""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    // single-relation FROM: the wrap takes the relation's name as its
    // alias so qualified refs keep resolving (round 11)
    assert(rewritten.contains(") orders"), rewritten)
    // the subquery's FROM nation must NOT be wrapped
    assert(!rewritten.contains("FROM (SELECT *, dense_rank() OVER" +
      " (PARTITION BY o_orderpriority ORDER BY o_orderdate) AS __graft_dr1 FROM nation)"))
    val rows = spark.sql(rewritten).collect()
    assert(rows.length === 200 || rows.nonEmpty)
  }

  test("wrap keeps the FROM alias: table-qualified outer refs resolve (round-10 cliff removed)") {
    Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT o.o_orderkey, o.o_totalprice,
        |  CAST(min(o.o_totalprice) OVER (PARTITION BY o.o_orderpriority
        |    ORDER BY o.o_orderdate EXCLUDE GROUP) AS DOUBLE) AS s
        |FROM orders o WHERE o.o_orderkey <= 100""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    assert(rewritten.contains(") o"), rewritten)
    val rows = spark.sql(rewritten).collect()
    assert(rows.nonEmpty)
  }

  test("bare SELECT * never leaks helper columns (star-EXCEPT hygiene)") {
    Tables.registerAll(spark, sfDir)
    val base = spark.sql("SELECT * FROM nation").columns.toSeq
    val sql =
      """SELECT *, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP)
        | AS BIGINT) AS c
        |FROM nation""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    val got = spark.sql(rewritten)
    assert(got.columns.toSeq === base :+ "c",
      s"helper columns leaked: ${got.columns.mkString(",")}")
    // qualified star over the preserved alias: same hygiene
    val qsql =
      """SELECT n.*, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP)
        | AS BIGINT) AS c
        |FROM nation n""".stripMargin
    val qgot = spark.sql(WindowExclude.rewrite(qsql))
    assert(qgot.columns.toSeq === base :+ "c",
      s"helper columns leaked through n.*: ${qgot.columns.mkString(",")}")
    // a star qualified by a NON-preserved alias cannot be fixed — the
    // block must reject (EXCLUDE survives for Spark to reject loudly)
    val bad = "SELECT a.*, min(a.x) OVER (ORDER BY a.x EXCLUDE GROUP) FROM t a JOIN u b ON a.k = b.k"
    assert(WindowExclude.rewrite(bad) == bad)
    // a user-written star-EXCEPT merges rather than double-EXCEPTs
    val merged = WindowExclude.rewrite(
      "SELECT * EXCEPT (n_name), min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS c FROM nation")
    assert("EXCEPT".r.findAllIn(merged.toUpperCase).size === 1, merged)
    assert(spark.sql(merged).columns.count(_.startsWith("__graft")) === 0)
    // DuckDB star sugar rewritten AFTER this pass (REPLACE/EXCLUDE lists)
    // must reject the block — inserting EXCEPT between the star and the
    // sugar would corrupt DialectSugar's later rewrite
    val starSugar =
      "SELECT * REPLACE (n_name AS x), min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) FROM nation"
    assert(WindowExclude.rewrite(starSugar) == starSugar)
  }

  // Round-12 (ADVICE): a '--' or '/* */' comment between SELECT (or a
  // comma) and '*' must not defeat the star-EXCEPT rewrite — comments read
  // as whitespace in the fixStars scanner, so the boundary flag survives
  // and the helper columns are excluded exactly as without the comment.
  test("comments before a star projection never leak helper columns") {
    Tables.registerAll(spark, sfDir)
    val base = spark.sql("SELECT * FROM nation").columns.toSeq
    val variants = Seq(
      "SELECT /* cols */ *, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS BIGINT) AS c FROM nation",
      "SELECT -- all columns\n *, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS BIGINT) AS c FROM nation",
      "SELECT /* nested /* comment */ still one */ *, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS BIGINT) AS c FROM nation",
      // comment between a comma and the star
      "SELECT n_name, /* rest */ n.*, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS BIGINT) AS c FROM nation n",
      // comment between SELECT and DISTINCT with a following star
      "SELECT /* c */ DISTINCT *, CAST(min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS BIGINT) AS c FROM nation")
    for (sql <- variants) {
      val rewritten = WindowExclude.rewrite(sql)
      assert(!rewritten.toUpperCase.contains("EXCLUDE GROUP"), rewritten)
      val got = spark.sql(rewritten)
      assert(got.columns.count(_.startsWith("__graft")) === 0,
        s"helper columns leaked for:\n$sql\n→ $rewritten\n→ ${got.columns.mkString(",")}")
      assert(got.columns.last === "c", rewritten)
      // star expands to exactly the base columns (plus the extra explicit
      // n_name in the comma variant) — nothing dropped, nothing added
      val extra = if (sql.startsWith("SELECT n_name,")) 1 else 0
      assert(got.columns.size === base.size + 1 + extra, rewritten)
    }
    // a comment INSIDE a qualified star path defeats the star regex — the
    // block must reject loudly (EXCLUDE survives), never leak helpers
    val weird =
      "SELECT n./* ? */*, min(n_nationkey) OVER (ORDER BY n_regionkey EXCLUDE GROUP) AS c FROM nation n"
    assert(WindowExclude.rewrite(weird) == weird)
  }

  test("k-offset ROWS frames with EXCLUDE TIES/GROUP match a window-free reference") {
    Tables.registerAll(spark, sfDir)
    // Tie-order determinism: with real peer groups (l_linenumber ties are
    // huge), per-ROW results depend on which peer got which row_number —
    // but the MULTISET of (flag, linenumber, result) rows does not, as
    // long as the aggregated value is a function of the ORDER BY key:
    // every rn-range cuts only inside peer groups, where the value is
    // constant. Both the rewrite and the self-join reference therefore
    // produce identical multisets under any tie order.
    val sql =
      """SELECT l_returnflag, l_linenumber,
        |  CAST(sum(l_linenumber) OVER w AS BIGINT) AS g_sum,
        |  CAST(count(*) OVER w AS BIGINT) AS g_cnt,
        |  CAST(count(l_linenumber) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_linenumber
        |    ROWS BETWEEN 4 PRECEDING AND 1 FOLLOWING EXCLUDE TIES) AS BIGINT) AS t_cnt,
        |  CAST(avg(l_linenumber) OVER (PARTITION BY l_returnflag
        |    ORDER BY l_linenumber
        |    ROWS BETWEEN 2 PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP)
        |    AS DOUBLE) AS mixed_avg
        |FROM lineitem WHERE l_orderkey <= 1000
        |WINDOW w AS (PARTITION BY l_returnflag ORDER BY l_linenumber
        |             ROWS BETWEEN 3 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP)""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    assert(rewritten.contains("row_number() OVER"), rewritten)
    val got = spark.sql(rewritten)
    // reference: materialize rn/peer bounds, then aggregate the physical
    // frame minus the peer group via an explicit range self-join
    val ref = spark.sql(
      """WITH b AS (
        |  SELECT l_returnflag, l_linenumber,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_linenumber) AS rn,
        |    min(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_linenumber))
        |      OVER (PARTITION BY l_returnflag, l_linenumber) AS ps,
        |    max(row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_linenumber))
        |      OVER (PARTITION BY l_returnflag, l_linenumber) AS pe
        |  FROM lineitem WHERE l_orderkey <= 1000)
        |SELECT a.l_returnflag, a.l_linenumber,
        |  sum(CASE WHEN x.rn BETWEEN a.rn - 3 AND a.rn + 2
        |           AND (x.rn < a.ps OR x.rn > a.pe) THEN x.l_linenumber END) AS g_sum,
        |  count(CASE WHEN x.rn BETWEEN a.rn - 3 AND a.rn + 2
        |           AND (x.rn < a.ps OR x.rn > a.pe) THEN 1 END) AS g_cnt,
        |  count(CASE WHEN x.rn BETWEEN a.rn - 4 AND a.rn + 1
        |           AND (x.rn < a.ps OR x.rn > a.pe OR x.rn = a.rn) THEN 1 END) AS t_cnt,
        |  CAST(sum(CASE WHEN x.rn >= a.rn - 2
        |           AND (x.rn < a.ps OR x.rn > a.pe) THEN x.l_linenumber END) AS DOUBLE)
        |    / nullif(count(CASE WHEN x.rn >= a.rn - 2
        |           AND (x.rn < a.ps OR x.rn > a.pe) THEN 1 END), 0) AS mixed_avg
        |FROM b a JOIN b x ON a.l_returnflag = x.l_returnflag
        |GROUP BY a.l_returnflag, a.l_linenumber, a.rn, a.ps, a.pe""".stripMargin)
    assert(got.count() > 0 && got.count() === ref.count())
    assert(got.exceptAll(ref).count() === 0 && ref.exceptAll(got).count() === 0)
    // frames must both cut peer groups (boundary rows: nonempty pieces)
    // and fall entirely inside one (interior rows: empty pieces, g_cnt=0)
    import org.apache.spark.sql.functions.col
    assert(got.filter(col("g_cnt") === 0).count() > 0)
    assert(got.filter(col("g_cnt") > 0).count() > 0)
  }

  test("TIES/GROUP frame-grid spellings: GROUPS mode, short form, DESC + multi-column order keys") {
    Tables.registerAll(spark, sfDir)
    // GROUPS mode and the no-BETWEEN short form both map onto the same
    // supported grid; the window base uses a DESC key plus a second
    // order column, so peer groups are (status, priority) pairs
    val sql =
      """SELECT o_orderkey,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderstatus DESC, o_orderdate
        |    GROUPS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS non_peers,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderstatus DESC, o_orderdate
        |    ROWS UNBOUNDED PRECEDING EXCLUDE TIES) AS BIGINT) AS short_ties_cnt
        |FROM orders WHERE o_orderkey <= 2000""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    assert(rewritten.contains("ORDER BY o_orderstatus DESC, o_orderdate) AS __graft_dr1"),
      rewritten)
    val got = spark.sql(rewritten)
    val ref = spark.sql(
      """SELECT a.o_orderkey,
        |  count(CASE WHEN b.o_orderstatus <> a.o_orderstatus
        |             OR b.o_orderdate <> a.o_orderdate THEN 1 END) AS non_peers,
        |  count(CASE WHEN b.o_orderstatus > a.o_orderstatus
        |             OR (b.o_orderstatus = a.o_orderstatus
        |                 AND b.o_orderdate < a.o_orderdate) THEN 1 END) + 1
        |    AS short_ties_cnt
        |FROM (SELECT * FROM orders WHERE o_orderkey <= 2000) a
        |JOIN (SELECT * FROM orders WHERE o_orderkey <= 2000) b
        |  ON a.o_orderpriority = b.o_orderpriority
        |GROUP BY a.o_orderkey""".stripMargin)
    assert(got.count() > 0)
    assert(got.exceptAll(ref).count() === 0 && ref.exceptAll(got).count() === 0)
  }

  test("TIES/GROUP out-of-scope shapes pass through: k-offset min/max (ROWS and RANGE), GROUP BY block with min, missing ORDER BY") {
    // ROWS-offset pieces are prefix-aggregate differences and RANGE
    // offsets ride the subtract path — min/max can do neither
    val kMin =
      "SELECT min(x) OVER (ORDER BY y ROWS BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) FROM t"
    assert(WindowExclude.rewrite(kMin) == kMin)
    val kRangeMin =
      "SELECT min(x) OVER (ORDER BY y RANGE BETWEEN 2 PRECEDING AND 2 FOLLOWING EXCLUDE GROUP) FROM t"
    assert(WindowExclude.rewrite(kRangeMin) == kRangeMin)
    // grouped blocks rewrite via their own wrap since round 12 — but only
    // under the supported item grammar; an item mixing a window call with
    // other arithmetic must still reject
    val groupedMixed =
      "SELECT g, min(min(x)) OVER (ORDER BY g EXCLUDE TIES) + g FROM t GROUP BY g"
    assert(WindowExclude.rewrite(groupedMixed) == groupedMixed)
    // ORDER BY tails carrying parenthesised expressions would re-bind
    // against the outer select — reject
    val groupedTail =
      "SELECT g, min(min(x)) OVER (ORDER BY g EXCLUDE TIES) AS m FROM t GROUP BY g ORDER BY count(*)"
    assert(WindowExclude.rewrite(groupedTail) == groupedTail)
    // unaliased non-trivial non-window items have no referenceable name
    // for the outer re-projection — reject
    val groupedNoAlias =
      "SELECT g + 1, min(min(x)) OVER (ORDER BY g EXCLUDE TIES) AS m FROM t GROUP BY g"
    assert(WindowExclude.rewrite(groupedNoAlias) == groupedNoAlias)
    val noOrder =
      "SELECT sum(x) OVER (PARTITION BY p RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES) FROM t"
    assert(WindowExclude.rewrite(noOrder) == noOrder)
  }

  test("set-op branches wrap independently; operator and trailing ORDER BY survive (round 11)") {
    Tables.registerAll(spark, sfDir)
    def branch(status: String, fn: String, frame: String) =
      s"""SELECT o_orderkey AS k,
         |  $fn(o_totalprice) OVER (PARTITION BY o_orderpriority
         |    ORDER BY o_orderdate $frame) AS m
         |FROM orders WHERE o_orderstatus = '$status'""".stripMargin
    val f1 = "RANGE BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW EXCLUDE TIES"
    val f2 = "RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING EXCLUDE GROUP"
    // min/max force the wrapped dense_rank path in BOTH branches; the
    // trailing ORDER BY belongs to the union and must stay outside both
    val union = branch("F", "min", f1) + "\nUNION ALL\n" +
      branch("O", "max", f2) + "\nORDER BY k"
    val rw = WindowExclude.rewrite(union)
    assert(!rw.toUpperCase.contains("EXCLUDE"), rw)
    assert(rw.toUpperCase.contains("UNION ALL"), rw)
    assert(rw.trim.toUpperCase.endsWith("ORDER BY K"), rw)
    val got = spark.sql(rw)
    assert(got.columns.toSeq === Seq("k", "m")) // no helper-column leak
    // each branch must equal its standalone rewrite (trusted by the
    // self-join reference tests above)
    val ref = spark.sql(WindowExclude.rewrite(branch("F", "min", f1)))
      .unionAll(spark.sql(WindowExclude.rewrite(branch("O", "max", f2))))
    assert(got.exceptAll(ref).count() == 0 && ref.exceptAll(got).count() == 0)
    // INTERSECT/EXCEPT branches rewrite too, each on its own pass; an
    // EXCLUDE-free branch stays verbatim
    val tri = WindowExclude.rewrite(
      "SELECT min(x) OVER (ORDER BY y EXCLUDE TIES) FROM a INTERSECT " +
      "SELECT min(x) OVER (ORDER BY y EXCLUDE GROUP) FROM b EXCEPT SELECT v FROM c")
    assert(!tri.toUpperCase.contains("EXCLUDE"), tri)
    assert(tri.toUpperCase.contains("INTERSECT") &&
      tri.toUpperCase.contains("EXCEPT SELECT V FROM C"), tri)
    // a GROUP BY branch inside a set-op rewrites via the grouped wrap
    // (round 12), with the operator and the later branch kept verbatim
    val groupedBranch =
      "SELECT g, min(min(x)) OVER (ORDER BY g EXCLUDE TIES) FROM t GROUP BY g UNION ALL SELECT 1, 2"
    val gb = WindowExclude.rewrite(groupedBranch)
    assert(!gb.toUpperCase.contains("EXCLUDE"), gb)
    assert(gb.toUpperCase.endsWith("UNION ALL SELECT 1, 2"), gb)
    // an UNSUPPORTED grouped branch (mixed window+arithmetic item) still
    // rejects, stopping the pass and leaving the whole statement as-is
    val badBranch =
      "SELECT g, min(min(x)) OVER (ORDER BY g EXCLUDE TIES) + g FROM t GROUP BY g UNION ALL SELECT 1, 2"
    assert(WindowExclude.rewrite(badBranch) == badBranch)
  }

  test("subtract path: RANGE-mode TIES/GROUP sum/count/avg are wrap-free and match a self-join reference") {
    Tables.registerAll(spark, sfDir)
    // default frame, explicit RANGE offsets, and the [k PRECEDING,
    // UNBOUNDED FOLLOWING] flip — all against an explicit value-range
    // self-join; o_orderdate peers are wide so TIES/GROUP bite. The
    // o_custkey argument is integer-valued, so subtraction is exact.
    val sql =
      """SELECT o_orderkey,
        |  CAST(sum(o_custkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate EXCLUDE GROUP) AS BIGINT) AS dflt_grp,
        |  CAST(count(*) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 2 DAYS PRECEDING AND INTERVAL 1 DAYS FOLLOWING
        |    EXCLUDE TIES) AS BIGINT) AS band_ties_cnt,
        |  CAST(avg(o_custkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate
        |    RANGE BETWEEN INTERVAL 2 DAYS PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS DOUBLE) AS flip_avg
        |FROM orders WHERE o_orderkey <= 2000""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    // wrap-free: no helper columns, no derived table
    assert(!rewritten.contains("__graft"), rewritten)
    // no O(n^2) UNBOUNDED FOLLOWING upper bound survives (the flip case
    // must be spelled DESC NULLS FIRST [UNB PRECEDING, k FOLLOWING])
    assert(!rewritten.toUpperCase.contains("AND UNBOUNDED FOLLOWING EXCLUDE"))
    assert(rewritten.contains("DESC NULLS FIRST"), rewritten)
    val got = spark.sql(rewritten)
    val ref = spark.sql(
      """SELECT a.o_orderkey,
        |  CAST(sum(CASE WHEN b.o_orderdate < a.o_orderdate
        |         THEN b.o_custkey END) AS BIGINT) AS dflt_grp,
        |  CAST(count(CASE WHEN b.o_orderdate BETWEEN a.o_orderdate - INTERVAL 2 DAYS
        |           AND a.o_orderdate + INTERVAL 1 DAYS
        |           AND (b.o_orderdate <> a.o_orderdate OR b.rid = a.rid)
        |         THEN 1 END) AS BIGINT) AS band_ties_cnt,
        |  CAST(avg(CASE WHEN b.o_orderdate >= a.o_orderdate - INTERVAL 2 DAYS
        |           AND b.o_orderdate <> a.o_orderdate
        |         THEN b.o_custkey END) AS DOUBLE) AS flip_avg
        |FROM (SELECT *, o_orderkey AS rid FROM orders WHERE o_orderkey <= 2000) a
        |JOIN (SELECT *, o_orderkey AS rid FROM orders WHERE o_orderkey <= 2000) b
        |  ON a.o_orderpriority = b.o_orderpriority
        |GROUP BY a.o_orderkey""".stripMargin)
    assert(got.count() > 0 && got.count() === ref.count())
    // flip_avg is a sum/count division vs the reference's native avg —
    // ulp noise, so compare with a float tolerance (NULLs exact)
    import org.apache.spark.sql.functions.{abs, col}
    val cols = Seq("dflt_grp", "band_ties_cnt", "flip_avg")
    val joined = got.select(col("o_orderkey") +: cols.map(c => col(c).as("g_" + c)): _*)
      .join(ref.select(col("o_orderkey") +: cols.map(c => col(c).as("r_" + c)): _*),
        "o_orderkey")
    assert(joined.count() === got.count())
    val bad = joined.filter(cols.map(c =>
      !(col("g_" + c) <=> col("r_" + c)) &&
        !(col("g_" + c).isNotNull && col("r_" + c).isNotNull &&
          abs(col("g_" + c).cast("double") - col("r_" + c).cast("double")) < 1e-6)
    ).reduce(_ || _))
    assert(bad.count() === 0, bad.collect().take(5).mkString("\n"))
    // the subtract path needs no wrap, so GROUP BY blocks are in scope
    val grouped =
      """SELECT o_orderpriority, o_orderstatus,
        |  CAST(sum(count(*)) OVER (ORDER BY o_orderpriority EXCLUDE GROUP)
        |    AS BIGINT) AS other_cnt
        |FROM orders GROUP BY o_orderpriority, o_orderstatus""".stripMargin
    val grewritten = WindowExclude.rewrite(grouped)
    assert(!grewritten.toUpperCase.contains("EXCLUDE"), grewritten)
    val g = spark.sql(grewritten)
    val gref = spark.sql(
      """WITH c AS (SELECT o_orderpriority, o_orderstatus, count(*) AS n
        |           FROM orders GROUP BY o_orderpriority, o_orderstatus)
        |SELECT a.o_orderpriority, a.o_orderstatus,
        |  CAST(sum(CASE WHEN b.o_orderpriority < a.o_orderpriority
        |         THEN b.n END) AS BIGINT) AS other_cnt
        |FROM c a CROSS JOIN c b
        |GROUP BY a.o_orderpriority, a.o_orderstatus""".stripMargin)
    assert(g.count() > 0)
    assert(g.exceptAll(gref).count() === 0 && gref.exceptAll(g).count() === 0)
  }

  // Round 12: GROUP BY/HAVING blocks rewrite via the grouped wrap — the
  // grouped query becomes the inner derived table (helpers evaluate
  // post-group) and the outer select re-projects with the frame pieces.
  test("grouped blocks: EXCLUDE TIES/GROUP over grouped aggregates matches a hand-computed reference") {
    Tables.registerAll(spark, sfDir)
    // 5 groups, one row each post-group; ORDER BY the group key makes
    // every row its own peer group → full frame EXCLUDE GROUP = min over
    // all OTHER rows (the default frame would stop at the current group)
    val sql =
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(count(*)) OVER (ORDER BY o_orderpriority
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS m
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    val got = spark.sql(rewritten).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    assert(got.length > 1)
    val counts = got.map(_._2)
    got.foreach { case (_, n, m) =>
      // min over the multiset of counts minus ONE instance of this row's n
      val buf = counts.toBuffer
      buf.remove(buf.indexOf(n))
      assert(m === buf.min, s"n=$n m=$m counts=${counts.mkString(",")}")
    }
    // PARTITION BY + HAVING + alias tail + TIES (keeps the current row)
    val sql2 =
      """SELECT o_orderpriority, o_orderstatus, sum(o_totalprice) AS s,
        |  sum(sum(o_totalprice)) OVER (PARTITION BY o_orderstatus
        |    ORDER BY o_orderpriority EXCLUDE TIES) AS w
        |FROM orders GROUP BY o_orderpriority, o_orderstatus
        |HAVING count(*) > 1 ORDER BY o_orderstatus, o_orderpriority""".stripMargin
    val rw2 = WindowExclude.rewrite(sql2)
    assert(!rw2.toUpperCase.contains("EXCLUDE"), rw2)
    val rows = spark.sql(rw2).collect()
      .map(r => (r.getString(0), r.getString(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    // reference: default RANGE frame [start, current group] minus peers
    // plus self — with a unique order key per partition row, w = prefix
    // sum up to and including this row
    rows.groupBy(_._2).foreach { case (_, part) =>
      val sorted = part.sortBy(_._1)
      var acc = 0.0
      sorted.foreach { case (_, _, s, w) =>
        acc += s
        assert(math.abs(w - acc) < 1e-6 * math.max(1.0, math.abs(acc)),
          s"w=$w expected=$acc")
      }
    }
    // output schema: exactly the declared columns, no helper leak
    assert(spark.sql(rw2).columns.toSeq ===
      Seq("o_orderpriority", "o_orderstatus", "s", "w"))
  }

  // Round-13 (ADVICE): the grouped-wrap select-item scan must be
  // comment-aware like the sibling scanners — a ',' or parenthesis inside
  // a -- / /* */ comment must not mis-split items or corrupt depth
  // tracking (which could emit garbled SQL, violating the "reject loudly,
  // never silently" invariant).
  test("comments with commas/parens inside a grouped EXCLUDE select list") {
    Tables.registerAll(spark, sfDir)
    val plain =
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(min(count(*)) OVER (ORDER BY o_orderpriority
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS m
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin
    val expect = spark.sql(WindowExclude.rewrite(plain)).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(expect.nonEmpty)
    val variants = Seq(
      // block comment with a comma and an unbalanced paren between items
      """SELECT o_orderpriority, /* a, b ( */ count(*) AS n,
        |  CAST(min(count(*)) OVER (ORDER BY o_orderpriority
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS m
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      // line comment with ',' and ')' at the end of an item
      """SELECT o_orderpriority, count(*) AS n, -- t, ) x
        |  CAST(min(count(*)) OVER (ORDER BY o_orderpriority
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS m
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,
      // a bogus 'AS zz' inside a comment must not clobber the real alias
      """SELECT o_orderpriority, count(*) AS n /* AS zz */,
        |  CAST(min(count(*)) OVER (ORDER BY o_orderpriority
        |    RANGE BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING
        |    EXCLUDE GROUP) AS BIGINT) AS m
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin)
    for (sql <- variants) {
      val rewritten = WindowExclude.rewrite(sql)
      if (rewritten != sql) { // rewrote: must be valid AND correct
        assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
        val got = spark.sql(rewritten).collect()
          .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
        assert(got === expect, s"for:\n$sql\n→ $rewritten")
        assert(spark.sql(rewritten).columns.count(_.startsWith("__graft")) === 0,
          rewritten)
      }
      // unchanged = loud reject downstream — acceptable; garbled SQL is not
    }
  }

  test("GROUPS k-offset frames with EXCLUDE TIES/GROUP: all five aggregates match a peer-group reference") {
    Tables.registerAll(spark, sfDir)
    // GROUPS offsets are whole peer groups — dense_rank units — so the
    // pieces are integer-RANGE sliding frames and min/max work too
    val sql =
      """SELECT o_orderkey,
        |  CAST(sum(o_custkey) OVER w AS BIGINT) AS s,
        |  CAST(count(*) OVER w AS BIGINT) AS c,
        |  CAST(min(o_custkey) OVER w AS BIGINT) AS mn,
        |  CAST(max(o_custkey) OVER w AS BIGINT) AS mx,
        |  CAST(avg(o_custkey) OVER (PARTITION BY o_orderpriority
        |    ORDER BY o_orderdate
        |    GROUPS BETWEEN 1 PRECEDING AND 2 FOLLOWING EXCLUDE TIES)
        |    AS DOUBLE) AS av
        |FROM orders WHERE o_orderkey <= 2000
        |WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_orderdate
        |             GROUPS BETWEEN 2 PRECEDING AND 1 FOLLOWING EXCLUDE GROUP)""".stripMargin
    val rewritten = WindowExclude.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("EXCLUDE"), rewritten)
    assert(rewritten.contains("PRECEDING AND 1 PRECEDING"), rewritten)
    val got = spark.sql(rewritten)
    val ref = spark.sql(
      """WITH b AS (
        |  SELECT o_orderkey, o_custkey, o_orderpriority, o_orderdate,
        |    dense_rank() OVER (PARTITION BY o_orderpriority
        |      ORDER BY o_orderdate) AS dr
        |  FROM orders WHERE o_orderkey <= 2000)
        |SELECT a.o_orderkey,
        |  CAST(sum(CASE WHEN x.dr BETWEEN a.dr - 2 AND a.dr + 1
        |         AND x.dr <> a.dr THEN x.o_custkey END) AS BIGINT) AS s,
        |  CAST(count(CASE WHEN x.dr BETWEEN a.dr - 2 AND a.dr + 1
        |         AND x.dr <> a.dr THEN 1 END) AS BIGINT) AS c,
        |  CAST(min(CASE WHEN x.dr BETWEEN a.dr - 2 AND a.dr + 1
        |         AND x.dr <> a.dr THEN x.o_custkey END) AS BIGINT) AS mn,
        |  CAST(max(CASE WHEN x.dr BETWEEN a.dr - 2 AND a.dr + 1
        |         AND x.dr <> a.dr THEN x.o_custkey END) AS BIGINT) AS mx,
        |  CAST((sum(CASE WHEN x.dr BETWEEN a.dr - 1 AND a.dr + 2
        |         AND x.dr <> a.dr THEN x.o_custkey END)
        |      + max(a.o_custkey)) AS DOUBLE)
        |    / (count(CASE WHEN x.dr BETWEEN a.dr - 1 AND a.dr + 2
        |         AND x.dr <> a.dr THEN 1 END) + 1) AS av
        |FROM b a JOIN b x ON a.o_orderpriority = x.o_orderpriority
        |GROUP BY a.o_orderkey, a.dr, a.o_custkey""".stripMargin)
    assert(got.count() > 0 && got.count() === ref.count())
    assert(got.exceptAll(ref).count() === 0 && ref.exceptAll(got).count() === 0)
  }
}
