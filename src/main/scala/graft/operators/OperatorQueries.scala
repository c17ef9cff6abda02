package graft.operators

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Operator-focused coverage beyond the TPC-H shapes: set operations, window
  * functions, GROUPING SETS/ROLLUP, scalar string/math/date functions, NULL
  * handling, DISTINCT, cross join, casts, time-bucketed event aggregation.
  *
  * These map to SURVEY.md §2.5 (windows), §2.7 (set ops), §2.8 (scalar
  * functions) — surfaces the reference engine (DuckDB core) provides and the
  * Spark engine must match 1:1 against the DuckDB oracle.
  */
object OperatorQueries {

  private def t(s: SparkSession, dir: String)(n: String): DataFrame =
    Tables.load(s, dir, n)

  /** UNION ALL of two projections + re-aggregation. */
  private def q23(s: SparkSession, dir: String): DataFrame = {
    val c = t(s, dir)("customer").select(col("c_nationkey").as("nationkey"))
    val su = t(s, dir)("supplier").select(col("s_nationkey").as("nationkey"))
    c.unionAll(su).groupBy(col("nationkey")).agg(count(lit(1)).as("n"))
      .orderBy(col("nationkey"))
  }

  private val q23Sql =
    """SELECT nationkey, count(*) AS n
      |FROM (SELECT c_nationkey AS nationkey FROM customer
      |      UNION ALL SELECT s_nationkey FROM supplier) u
      |GROUP BY nationkey ORDER BY nationkey""".stripMargin

  /** INTERSECT and EXCEPT, tagged and unioned into one result. */
  private def q24(s: SparkSession, dir: String): DataFrame = {
    val p = t(s, dir)("part").select(col("p_partkey"))
    val l = t(s, dir)("lineitem").select(col("l_partkey").as("p_partkey"))
    val both = p.intersect(l).agg(count(lit(1)).as("n")).select(lit("ordered").as("tag"), col("n"))
    val never = p.except(l).agg(count(lit(1)).as("n")).select(lit("never_ordered").as("tag"), col("n"))
    both.unionAll(never).orderBy(col("tag"))
  }

  private val q24Sql =
    """SELECT * FROM (
      |  SELECT 'ordered' AS tag, count(*) AS n
      |  FROM (SELECT p_partkey FROM part INTERSECT SELECT l_partkey FROM lineitem) a
      |  UNION ALL
      |  SELECT 'never_ordered' AS tag, count(*) AS n
      |  FROM (SELECT p_partkey FROM part EXCEPT SELECT l_partkey FROM lineitem) b) u
      |ORDER BY tag""".stripMargin

  /** Ranking window functions: row_number / rank / dense_rank per partition,
    * with a deterministic unique tie-break in the ordering. */
  private def q25(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    t(s, dir)("orders")
      .withColumn("rn", row_number().over(w))
      .withColumn("rnk", rank().over(w))
      .withColumn("drnk", dense_rank().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"), col("o_totalprice"),
        col("rn"), col("rnk"), col("drnk"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val q25Sql =
    """SELECT o_custkey, o_orderkey, o_totalprice, rn, rnk, drnk
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER w AS rn, rank() OVER w AS rnk, dense_rank() OVER w AS drnk
      |      FROM orders
      |      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey)) t
      |WHERE rn <= 3 ORDER BY o_custkey, rn""".stripMargin

  /** Running/frame window aggregates + lag/lead over the events stream.
    * Ordering key is the unique event_id (event timestamps are ns-precision
    * in the source; ns ties would order differently across engines). */
  private def q26(s: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("event_id"))
    val wRun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    t(s, dir)("events")
      .withColumn("cents", floor(col("value") * 100).cast("long"))
      .withColumn("running_cents", sum(col("cents")).over(wRun))
      .withColumn("seq", row_number().over(w))
      .withColumn("prev_type", lag(col("event_type"), 1).over(w))
      .withColumn("next_type", lead(col("event_type"), 1).over(w))
      .select(col("user_id"), col("event_id"), col("seq"), col("cents"),
        col("running_cents"), col("prev_type"), col("next_type"))
      .orderBy(col("user_id"), col("seq"))
  }

  private val q26Sql =
    """SELECT user_id, event_id, seq, cents, running_cents, prev_type, next_type
      |FROM (SELECT user_id, event_id,
      |        row_number() OVER w AS seq,
      |        CAST(floor(value * 100) AS BIGINT) AS cents,
      |        CAST(sum(CAST(floor(value * 100) AS BIGINT))
      |          OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents,
      |        lag(event_type, 1) OVER w AS prev_type,
      |        lead(event_type, 1) OVER w AS next_type
      |      FROM events
      |      WINDOW w AS (PARTITION BY user_id ORDER BY event_id)) t
      |ORDER BY user_id, seq""".stripMargin

  /** ROLLUP over region→nation with grouping() discriminators. */
  private def q27(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("customer")
      .join(broadcast(t(s, dir)("nation")), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(t(s, dir)("region")), col("n_regionkey") === col("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_cust"), sum(col("c_acctbal")).as("total_bal"),
        grouping(col("r_name")).cast("int").as("g_region"),
        grouping(col("n_name")).cast("int").as("g_nation"))
      .orderBy(col("g_region"), col("g_nation"), col("r_name"), col("n_name"))

  private val q27Sql =
    """SELECT r_name, n_name, count(*) AS n_cust, sum(c_acctbal) AS total_bal,
      | CAST(grouping(r_name) AS INTEGER) AS g_region,
      | CAST(grouping(n_name) AS INTEGER) AS g_nation
      |FROM customer, nation, region
      |WHERE c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY g_region, g_nation, r_name, n_name""".stripMargin

  /** String scalar functions: upper/lower/substring/trim/replace/length/
    * concat/lpad/reverse (SURVEY §2.8). */
  private def q28(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("nation")
      .select(
        col("n_nationkey"),
        upper(col("n_name")).as("up"),
        lower(col("n_name")).as("lo"),
        substring(col("n_name"), 1, 6).as("sub"),
        length(col("n_name")).cast("long").as("len"),
        concat(col("n_name"), lit("_"), col("n_nationkey").cast("string")).as("cat"),
        regexp_replace(col("n_name"), "_", "-").as("repl"),
        lpad(col("n_nationkey").cast("string"), 4, "0").as("padded"),
        reverse(col("n_name")).as("rev"),
        trim(lit("  x  ")).as("trimmed"))
      .orderBy(col("n_nationkey"))

  private val q28Sql =
    """SELECT n_nationkey, upper(n_name) AS up, lower(n_name) AS lo,
      | substring(n_name, 1, 6) AS sub, CAST(length(n_name) AS BIGINT) AS len,
      | n_name || '_' || CAST(n_nationkey AS VARCHAR) AS cat,
      | regexp_replace(n_name, '_', '-', 'g') AS repl,
      | lpad(CAST(n_nationkey AS VARCHAR), 4, '0') AS padded,
      | reverse(n_name) AS rev, trim('  x  ') AS trimmed
      |FROM nation ORDER BY n_nationkey""".stripMargin

  /** Time-bucketed aggregation over the event stream (hourly rollups as
    * strings to dodge timestamp-precision mismatches). */
  private def q29(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("events")
      .groupBy(date_format(col("ts"), "yyyy-MM-dd HH").as("hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .orderBy(col("hour"), col("event_type"))

  private val q29Sql =
    """SELECT strftime(ts, '%Y-%m-%d %H') AS hour, event_type,
      | count(*) AS n, sum(value) AS total_value
      |FROM events GROUP BY hour, event_type ORDER BY hour, event_type""".stripMargin

  /** SELECT DISTINCT + multi-column ORDER BY with mixed directions. */
  private def q30(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .select(col("l_returnflag"), col("l_linestatus"))
      .distinct()
      .orderBy(col("l_returnflag").asc, col("l_linestatus").desc)

  private val q30Sql =
    """SELECT DISTINCT l_returnflag, l_linestatus
      |FROM lineitem ORDER BY l_returnflag ASC, l_linestatus DESC""".stripMargin

  /** Math scalar functions — only IEEE-exact ops (abs/ceil/floor/sqrt/mod/
    * greatest/least), so both engines produce bit-identical doubles. */
  private def q31(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .filter(col("l_orderkey") % 100 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_discount") - 0.05).as("abs_d"),
        ceil(col("l_extendedprice")).cast("long").as("ceil_p"),
        floor(col("l_extendedprice")).cast("long").as("floor_p"),
        sqrt(col("l_quantity")).as("sqrt_q"),
        (col("l_orderkey") % 7).as("mod7"),
        greatest(col("l_tax"), col("l_discount")).as("hi"),
        least(col("l_tax"), col("l_discount")).as("lo"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q31Sql =
    """SELECT l_orderkey, l_linenumber,
      | abs(l_discount - 0.05) AS abs_d,
      | CAST(ceil(l_extendedprice) AS BIGINT) AS ceil_p,
      | CAST(floor(l_extendedprice) AS BIGINT) AS floor_p,
      | sqrt(l_quantity) AS sqrt_q,
      | l_orderkey % 7 AS mod7,
      | greatest(l_tax, l_discount) AS hi,
      | least(l_tax, l_discount) AS lo
      |FROM lineitem WHERE l_orderkey % 100 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Date/time part extraction: year/month/day/quarter + date truncation. */
  private def q32(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders")
      .select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("d"),
        quarter(col("o_orderdate")).as("q"),
        col("o_orderdate").cast("date").as("odate"))
      .filter(col("y") === 1997)
      .orderBy(col("o_orderkey"))

  private val q32Sql =
    """SELECT o_orderkey,
      | CAST(year(o_orderdate) AS INTEGER) AS y,
      | CAST(month(o_orderdate) AS INTEGER) AS m,
      | CAST(day(o_orderdate) AS INTEGER) AS d,
      | CAST(quarter(o_orderdate) AS INTEGER) AS q,
      | CAST(o_orderdate AS DATE) AS odate
      |FROM orders WHERE year(o_orderdate) = 1997 ORDER BY o_orderkey""".stripMargin

  /** NULL semantics: NULLIF/COALESCE/CASE-null, count(col) vs count(*),
    * IS NULL / IS NOT NULL filters. */
  private def q33(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("orders")
      .withColumn("status_or_null", nullif(col("o_orderstatus"), lit("O")))
      .groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n_all"),
        count(col("status_or_null")).as("n_nonnull"),
        sum(when(col("status_or_null").isNull, 1).otherwise(0)).as("n_null"),
        count(coalesce(col("status_or_null"), lit("X"))).as("n_coalesced"))
      .orderBy(col("o_orderpriority"))

  private val q33Sql =
    """SELECT o_orderpriority, count(*) AS n_all,
      | count(nullif(o_orderstatus, 'O')) AS n_nonnull,
      | CAST(sum(CASE WHEN nullif(o_orderstatus, 'O') IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
      | count(coalesce(nullif(o_orderstatus, 'O'), 'X')) AS n_coalesced
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  /** Cross join (small × small). */
  private def q34(s: SparkSession, dir: String): DataFrame = {
    val r1 = t(s, dir)("region").select(col("r_name").as("a"))
    val r2 = t(s, dir)("region").select(col("r_name").as("b"))
    r1.crossJoin(r2).orderBy(col("a"), col("b"))
  }

  private val q34Sql =
    """SELECT r1.r_name AS a, r2.r_name AS b
      |FROM region r1 CROSS JOIN region r2 ORDER BY a, b""".stripMargin

  /** Cast matrix across int widths / date / string — only casts whose
    * semantics agree between Spark and DuckDB (no double→int, which
    * truncates in Spark but rounds in DuckDB). */
  private def q35(s: SparkSession, dir: String): DataFrame =
    t(s, dir)("lineitem")
      .filter(col("l_orderkey") % 200 === 0)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_linenumber").cast("long").as("ln_big"),
        col("l_orderkey").cast("int").as("ok_int"),
        (col("l_orderkey") % 100).cast("byte").as("ok_tiny"),
        (col("l_orderkey") % 30000).cast("short").as("ok_small"),
        floor(col("l_quantity")).cast("long").as("qty_floor"),
        col("l_shipdate").cast("date").as("ship_date"),
        col("l_orderkey").cast("string").as("ok_str"),
        col("l_linenumber").cast("double").as("ln_dbl"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val q35Sql =
    """SELECT l_orderkey, l_linenumber,
      | CAST(l_linenumber AS BIGINT) AS ln_big,
      | CAST(l_orderkey AS INTEGER) AS ok_int,
      | CAST(l_orderkey % 100 AS TINYINT) AS ok_tiny,
      | CAST(l_orderkey % 30000 AS SMALLINT) AS ok_small,
      | CAST(floor(l_quantity) AS BIGINT) AS qty_floor,
      | CAST(l_shipdate AS DATE) AS ship_date,
      | CAST(l_orderkey AS VARCHAR) AS ok_str,
      | CAST(l_linenumber AS DOUBLE) AS ln_dbl
      |FROM lineitem WHERE l_orderkey % 200 = 0
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q23_union_all", q23, Some(q23Sql)),
    Q("q24_intersect_except", q24, Some(q24Sql)),
    Q("q25_window_rank", q25, Some(q25Sql)),
    Q("q26_window_running_lag", q26, Some(q26Sql)),
    Q("q27_rollup_grouping", q27, Some(q27Sql)),
    Q("q28_string_functions", q28, Some(q28Sql)),
    Q("q29_events_hourly", q29, Some(q29Sql)),
    Q("q30_distinct_orderby", q30, Some(q30Sql)),
    Q("q31_math_functions", q31, Some(q31Sql)),
    Q("q32_date_parts", q32, Some(q32Sql)),
    Q("q33_null_semantics", q33, Some(q33Sql)),
    Q("q34_cross_join", q34, Some(q34Sql)),
    Q("q35_cast_matrix", q35, Some(q35Sql)))
}
