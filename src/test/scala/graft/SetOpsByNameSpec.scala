package graft

import graft.dialect.SetOpsByName
import org.scalatest.funsuite.AnyFunSuite

/** SetOpsByName: UNION [ALL] BY NAME aligns set-operation branches by
  * column name with NULL fill (DuckDB docs, sql/query_syntax/setops);
  * positional set ops and mixed forms must pass through untouched. */
class SetOpsByNameSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("branches align by name with NULL fill, left columns first") {
    val out = SetOpsByName.rewrite(spark,
      "SELECT 1 AS a, 2 AS b UNION ALL BY NAME SELECT 30 AS b, 40 AS c")
    val rows = spark.sql(out).collect()
    assert(spark.sql(out).schema.fieldNames.toSeq == Seq("a", "b", "c"))
    val asSets = rows.map(r => (0 until 3).map(i =>
      Option(r.get(i)).map(_.toString).orNull)).toSet
    assert(asSets == Set(Seq("1", "2", null), Seq(null, "30", "40")))
  }

  test("UNION BY NAME without ALL deduplicates") {
    val out = SetOpsByName.rewrite(spark,
      "SELECT 1 AS a UNION BY NAME SELECT 1 AS a UNION BY NAME SELECT 2 AS a")
    assert(spark.sql(out).collect().map(_.getInt(0)).sorted.toSeq == Seq(1, 2))
  }

  test("trailing ORDER BY / LIMIT scope over the whole union") {
    val out = SetOpsByName.rewrite(spark,
      "SELECT 3 AS a UNION ALL BY NAME SELECT 1 AS a ORDER BY a LIMIT 1")
    assert(spark.sql(out).collect().map(_.getInt(0)).toSeq == Seq(1))
  }

  test("positional set ops and mixed separators pass through") {
    val plain = "SELECT 1 AS a UNION ALL SELECT 2 AS a"
    assert(SetOpsByName.rewrite(spark, plain) == plain)
    val mixed = "SELECT 1 AS a UNION ALL SELECT 2 AS b UNION ALL BY NAME SELECT 3 AS c"
    assert(SetOpsByName.rewrite(spark, mixed) == mixed)
  }

  test("unresolvable branches fall through unchanged") {
    val bad = "SELECT x FROM __graft_no_such UNION ALL BY NAME SELECT 1 AS a"
    assert(SetOpsByName.rewrite(spark, bad) == bad)
  }
}
