package graft

import org.scalatest.funsuite.AnyFunSuite

/** Smoke + structural checks over the whole declared surface: every query
  * must run on sf0.001, produce rows, and have a resolvable schema. The
  * value-level gate is the DuckDB oracle (scripts/local_check.py + driver). */
class QueriesSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("entry() returns rows") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracleSql without a query: $missing")
  }

  test("query names are unique") {
    val names = SparkEntry.allQueries.map(_.name)
    assert(names.distinct.size === names.size)
  }

  SparkEntry.allQueries.foreach { q =>
    test(s"${q.name} runs and returns rows on sf0.001") {
      val df = q.fn(spark, sfDir)
      assert(df.schema.nonEmpty)
      assert(df.count() > 0, s"${q.name} returned 0 rows")
    }
  }
}
