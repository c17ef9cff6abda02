package graft

import graft.dialect.ListComprehension
import org.scalatest.funsuite.AnyFunSuite

/** ListComprehension: DuckDB bracket list literals / comprehensions map to
  * array/transform/filter; Spark's own bracket uses (value indexing, struct
  * field access) must pass through untouched. */
class ListComprehensionSpec extends AnyFunSuite {

  test("bare list literal becomes array()") {
    assert(ListComprehension.rewrite("SELECT [1, 2, 3]") ==
      "SELECT array(1, 2, 3)")
    assert(ListComprehension.rewrite("SELECT f([1, 2]) FROM t") ==
      "SELECT f(array(1, 2)) FROM t")
    assert(ListComprehension.rewrite("SELECT CASE WHEN a THEN [1] ELSE [2] END") ==
      "SELECT CASE WHEN a THEN array(1) ELSE array(2) END")
  }

  test("element indexing becomes 1-based graft_extract; struct access is left alone") {
    // DuckDB brackets are 1-based (and take negative from-the-end indexes);
    // Spark's bracket is 0-based, so passthrough would silently shift by one
    assert(ListComprehension.rewrite("SELECT l[1] FROM t") ==
      "SELECT graft_extract(l, 1) FROM t")
    assert(ListComprehension.rewrite("SELECT l[-1] FROM t") ==
      "SELECT graft_extract(l, -1) FROM t")
    assert(ListComprehension.rewrite("SELECT f(x)[2] FROM t") ==
      "SELECT graft_extract(f(x), 2) FROM t")
    // string keys = struct/map field access, Spark-native
    // round 13: string-literal brackets route through graft_extract too —
    // struct access stays scalar there, MAP brackets become list-valued
    assert(ListComprehension.rewrite("SELECT s['k'] FROM t") ==
      "SELECT graft_extract(s, 'k') FROM t")
    // type spellings and empty brackets are not indexes
    assert(ListComprehension.rewrite("SELECT CAST(x AS INT[]) FROM t") ==
      "SELECT CAST(x AS INT[]) FROM t")
    assert(ListComprehension.rewrite("SELECT CAST(x AS VARCHAR[3]) FROM t") ==
      "SELECT CAST(x AS VARCHAR[3]) FROM t")
    // postgres-style ARRAY literal
    assert(ListComprehension.rewrite("SELECT ARRAY[1, 2]") == "SELECT array(1, 2)")
  }

  test("bracket slices map to graft_slice (1-based inclusive, open ends, type-dispatched)") {
    assert(ListComprehension.rewrite("SELECT l[2:4] FROM t") ==
      "SELECT graft_slice(l, 2, 4) FROM t")
    assert(ListComprehension.rewrite("SELECT l[:3] FROM t") ==
      "SELECT graft_slice(l, 1, 3) FROM t")
    assert(ListComprehension.rewrite("SELECT l[2:] FROM t") ==
      "SELECT graft_slice(l, 2, 2147483647) FROM t")
    assert(ListComprehension.rewrite("SELECT f(x)[2:3] FROM t") ==
      "SELECT graft_slice(f(x), 2, 3) FROM t")
    // casts inside an index are NOT slices — they are 1-based element indexes
    assert(ListComprehension.rewrite("SELECT l[i::INT] FROM t") ==
      "SELECT graft_extract(l, i::INT) FROM t")
    // a literal bracket sliced in place: literal folds first, then slice
    assert(ListComprehension.rewrite("SELECT [1, 2, 3][1:2]") ==
      "SELECT graft_slice(array(1, 2, 3), 1, 2)")
  }

  test("comprehension without IF maps to transform") {
    assert(ListComprehension.rewrite("SELECT [x * 2 FOR x IN l] FROM t") ==
      "SELECT transform(l, x -> x * 2) FROM t")
  }

  test("comprehension with IF maps to transform over filter") {
    assert(ListComprehension.rewrite(
      "SELECT [upper(x) FOR x IN toks IF length(x) > 3] FROM t") ==
      "SELECT transform(filter(toks, x -> length(x) > 3), x -> upper(x)) FROM t")
  }

  test("nested brackets fold inside-out") {
    assert(ListComprehension.rewrite("SELECT [[x, 1] FOR x IN l] FROM t") ==
      "SELECT transform(l, x -> array(x, 1)) FROM t")
  }

  test("string literals shield bracket text and keywords") {
    assert(ListComprehension.rewrite("SELECT '[1,2]' FROM t") ==
      "SELECT '[1,2]' FROM t")
    assert(ListComprehension.rewrite("SELECT [concat(x, ' FOR y') FOR x IN l]") ==
      "SELECT transform(l, x -> concat(x, ' FOR y'))")
  }

  test("FOR without IN is a plain literal, not a comprehension") {
    assert(ListComprehension.rewrite("SELECT ['FOR'], [x FOR] FROM t") ==
      "SELECT array('FOR'), array(x FOR) FROM t")
  }

  test("engine path evaluates a comprehension end-to-end") {
    val engine = new session.Engine(
      session.EngineConfig(existingSession = Some(SparkTestSession.spark)))
    val conn = engine.connect()
    val rows = conn.queryDF(
      "SELECT [v * 10 FOR v IN [1, 2, 3] IF v <> 2] AS r")
      .collect().map(_.getSeq[Int](0))
    assert(rows.head == Seq(10, 30))
  }
}
