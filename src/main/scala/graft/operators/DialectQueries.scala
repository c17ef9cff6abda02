package graft.operators

import graft.{Q, Tables}
import graft.dialect.DialectSugar
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Oracled coverage for the DuckDB star-modifier / QUALIFY sugar that has
  * no Spark spelling (reference surface: duckdb docs/sql/expressions/star —
  * `* EXCLUDE` / `* REPLACE`; docs/sql/query_syntax/qualify — predicates may
  * reference columns the SELECT list does not project).
  *
  * Both queries execute the *sugar text itself* through
  * [[graft.dialect.DialectSugar]] — the same pass every engine query goes
  * through via DialectRewriter — and hand DuckDB the identical text as the
  * oracle, since DuckDB runs both forms natively. That makes the rewrite the
  * unit under oracle, not a hand-expanded equivalent.
  *
  * Scale note: the rewrite is string-level and happens once on the driver;
  * the emitted plan is an ordinary projection + window filter, so nothing
  * here changes shape at 100 TB.
  */
object DialectQueries {

  private def sugar(sql: String)(spark: SparkSession, dir: String): DataFrame = {
    Tables.registerAll(spark, dir)
    spark.sql(DialectSugar.rewrite(sql))
  }

  // star EXCLUDE + REPLACE on one star item: the EXCLUDE list must merge
  // into the emitted EXCEPT together with the replaced columns. Column
  // ORDER deviates by design (replaced columns move to the end — the
  // string rewrite cannot know the star's expansion order); the driver
  // compare sorts columns by name, and name-based consumers are unaffected.
  private val q57Sql =
    """SELECT * EXCLUDE (o_orderpriority)
      |       REPLACE (upper(o_orderstatus) AS o_orderstatus,
      |                o_totalprice * 2 AS o_totalprice)
      |FROM orders
      |WHERE o_orderkey <= 1000
      |ORDER BY o_orderkey""".stripMargin

  // QUALIFY over a column the SELECT list does not project (o_custkey):
  // DialectSugar injects it into the inner projection and strips it again
  // via star-EXCEPT, so the output schema stays exactly the declared one.
  private val q58Sql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice
      |FROM orders
      |QUALIFY row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) <= 2
      |ORDER BY o_orderkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q57_star_replace", sugar(q57Sql), Some(q57Sql)),
    Q("q58_qualify_unprojected", sugar(q58Sql), Some(q58Sql)))
}
