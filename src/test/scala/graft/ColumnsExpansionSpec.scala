package graft

import graft.dialect.ColumnsExpansion
import org.scalatest.funsuite.AnyFunSuite

/** COLUMNS(...) star-expression expansion against resolved schemas. */
class ColumnsExpansionSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark

  private def prepare(): Unit =
    Tables.registerAll(spark, SparkTestSession.sfDir)

  test("regex form expands to fully-matching columns in schema order") {
    prepare()
    val out = ColumnsExpansion.rewrite(spark,
      "SELECT COLUMNS('n_(nationkey|name)') FROM nation")
    assert(out.contains("n_nationkey") && out.contains("n_name"))
    assert(!out.toLowerCase.contains("columns("))
    assert(!out.contains("n_comment")) // no partial match leak
    val df = spark.sql(out)
    assert(df.columns.toSeq === Seq("n_nationkey", "n_name"))
  }

  test("star and EXCLUDE forms") {
    prepare()
    val all = ColumnsExpansion.rewrite(spark, "SELECT COLUMNS(*) FROM region")
    assert(spark.sql(all).columns.toSeq === spark.table("region").columns.toSeq)
    val excl = ColumnsExpansion.rewrite(spark,
      "SELECT COLUMNS(* EXCLUDE (r_comment)) FROM region")
    assert(spark.sql(excl).columns.toSeq ===
      spark.table("region").columns.filterNot(_ == "r_comment").toSeq)
  }

  test("wrapping expressions replicate per column") {
    prepare()
    val out = ColumnsExpansion.rewrite(spark,
      "SELECT min(COLUMNS('n_(nationkey|regionkey)')) FROM nation")
    assert(out.contains("min(n_nationkey)") && out.contains("min(n_regionkey)"))
    assert(spark.sql(out).columns.length === 2)
  }

  test("subquery levels expand against their own FROM") {
    prepare()
    val out = ColumnsExpansion.rewrite(spark,
      "SELECT count(*) AS n FROM (SELECT COLUMNS('n_.*key') FROM nation) t")
    assert(out.contains("n_nationkey") && out.contains("n_regionkey"))
    assert(spark.sql(out).collect().head.getLong(0) === 25L)
  }

  test("multi-relation FROM and unknown tables pass through untouched") {
    prepare()
    val join = "SELECT COLUMNS('x.*') FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey"
    assert(ColumnsExpansion.rewrite(spark, join) === join)
    val unknown = "SELECT COLUMNS('a.*') FROM __graft_no_such_table"
    assert(ColumnsExpansion.rewrite(spark, unknown) === unknown)
  }
}
