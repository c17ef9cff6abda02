package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Bracket-slice semantics via graft_slice — every expectation pinned
  * against DuckDB 1.0 behavior (slice of strings AND lists: 1-based
  * inclusive, negatives from the end, clamping, lo > hi = empty). */
class BracketSliceSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private def one(sql: String): Any = conn.queryDF(sql).collect().head.get(0)

  test("string slices match DuckDB") {
    assert(one("SELECT 'hello'[2:4] AS x") === "ell")
    assert(one("SELECT 'hello'[:3] AS x") === "hel")
    assert(one("SELECT 'hello'[3:] AS x") === "llo")
    assert(one("SELECT 'hello'[0:2] AS x") === "he")
    assert(one("SELECT 'hello'[-3:-1] AS x") === "llo")
    assert(one("SELECT 'hello'[4:2] AS x") === "")
    assert(one("SELECT 'hello'[2:99] AS x") === "ello")
    assert(one("SELECT 'hello'[-99:2] AS x") === "he")
  }

  test("list slices match DuckDB (incl. negatives and clamping)") {
    def arr(sql: String) = one(sql).asInstanceOf[scala.collection.Seq[Int]].toList
    assert(arr("SELECT ([1,2,3,4,5])[2:3] AS x") === List(2, 3))
    assert(arr("SELECT ([1,2,3,4,5])[-3:-1] AS x") === List(3, 4, 5))
    assert(arr("SELECT ([1,2,3,4,5])[0:2] AS x") === List(1, 2))
    assert(arr("SELECT ([1,2,3,4,5])[4:2] AS x") === Nil)
    assert(arr("SELECT ([1,2,3,4,5])[2:99] AS x") === List(2, 3, 4, 5))
    assert(arr("SELECT ([1,2,3,4,5])[3:] AS x") === List(3, 4, 5))
  }

  test("NULL input yields NULL; element index stays 1-based") {
    assert(conn.queryDF("SELECT (CAST(NULL AS STRING))[2:4] AS x")
      .collect().head.isNullAt(0))
    assert(one("SELECT ([10, 20, 30])[1] AS x") === 10)
  }

  test("slice over a column inside a real query") {
    Tables.registerAll(SparkTestSession.spark, "/root/testdata/sf0.001")
    // testdata names are synthetic ("NATION_0", …): [1:3] = first 3 chars,
    // [-1:] = last char — checked against substring ground truth per row
    val r = conn.queryDF(
      """SELECT n_name AS full, n_name[1:3] AS pre, n_name[-1:] AS last
        |FROM nation ORDER BY n_nationkey LIMIT 5""".stripMargin).collect()
    assert(r.nonEmpty)
    r.foreach { row =>
      val full = row.getString(0)
      assert(row.getString(1) === full.substring(0, math.min(3, full.length)))
      assert(row.getString(2) === full.takeRight(1))
    }
  }
}
