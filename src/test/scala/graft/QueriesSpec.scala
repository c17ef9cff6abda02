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

  test("q44 telemetry: HLL relative error stays inside the 2% oracle band at every SF") {
    // The driver oracle only asserts the within_2pct BOOLEAN at sf0.01; this
    // probes the estimate's ACTUAL relative error at each committed scale so
    // a future rsd/sketch change fails here before it fails the driver gate
    // (round-7 verdict item 8). Measured on this testdata generation:
    // sf0.001 max 0.50%, sf0.01 max 0.65%, sf0.1 max 0.67% — the rsd=0.01
    // sketch keeps ~3x headroom under the band at every committed SF.
    import org.apache.spark.sql.functions._
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01",
        "/root/testdata/sf0.1")) {
      val rows = Tables.load(spark, dir, "lineitem")
        .select(col("l_returnflag"), col("l_partkey")).distinct()
        .groupBy(col("l_returnflag"))
        .agg(count(lit(1)).as("exact"),
          approx_count_distinct(col("l_partkey"), 0.01).as("est"))
        .withColumn("rel_err",
          abs(col("est") - col("exact")).cast("double") / col("exact"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val err = r.getAs[Double]("rel_err")
        assert(err <= 0.02,
          s"$dir flag=${r.get(0)}: rel_err $err breaches the q44 oracle band")
      }
      info(s"$dir max rel_err = ${rows.map(_.getAs[Double]("rel_err")).max}")
    }
  }
}
