package graft

import graft.dialect.DialectSugar
import graft.operators.PositionalJoin
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** POSITIONAL JOIN: the dialect rewrite (window spelling) and the scale
  * operator (range-partitioned two-pass positions) must agree, and the
  * scale operator's plan must not contain a SinglePartition stage. */
class PositionalJoinSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def executed(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString

  test("dialect rewrite pairs by position and NULL-pads the shorter side") {
    Tables.registerAll(spark, sfDir)
    val sql =
      """SELECT coalesce(l.pos, r.pos) AS pos, l.lk, r.rk
        |FROM (SELECT row_number() OVER (ORDER BY o_orderkey) AS pos,
        |             o_orderkey AS lk
        |      FROM orders WHERE o_orderkey <= 100 ORDER BY lk) AS l
        |POSITIONAL JOIN
        |     (SELECT row_number() OVER (ORDER BY o_orderkey) AS pos,
        |             o_orderkey AS rk
        |      FROM orders WHERE o_orderkey <= 200 ORDER BY rk) AS r
        |ORDER BY pos""".stripMargin
    val rewritten = DialectSugar.rewrite(sql)
    assert(!rewritten.toUpperCase.contains("POSITIONAL"),
      s"rewrite did not fire:\n$rewritten")
    val rows = spark.sql(rewritten).collect()
    val nLeft = spark.sql(
      "SELECT count(*) FROM orders WHERE o_orderkey <= 100").head.getLong(0)
    val nRight = spark.sql(
      "SELECT count(*) FROM orders WHERE o_orderkey <= 200").head.getLong(0)
    assert(rows.length == nRight.toInt) // longer side wins
    // every row pairs equal positions while both sides are present
    rows.foreach { r =>
      if (!r.isNullAt(1) && !r.isNullAt(2)) assert(r.getLong(1) <= 100)
      if (r.getAs[Number](0).longValue > nLeft)
        assert(r.isNullAt(1), s"expected NULL pad: $r")
    }
    // pairing follows each side's declared order: row k carries the k-th
    // smallest key of each side
    val keys = rows.filter(!_.isNullAt(1)).map(_.getLong(1))
    assert(keys.sameElements(keys.sorted))
  }

  test("unsupported shapes (bare table / unordered subquery) pass through") {
    val bare = "SELECT * FROM orders a POSITIONAL JOIN orders b"
    assert(DialectSugar.rewrite(bare).toUpperCase.contains("POSITIONAL"))
    val unordered =
      "SELECT * FROM (SELECT 1 AS x) a POSITIONAL JOIN (SELECT 2 AS y) b"
    assert(DialectSugar.rewrite(unordered).toUpperCase.contains("POSITIONAL"))
  }

  test("scale operator equals the window spelling, with no SinglePartition") {
    val left = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey") <= 400)
      .select(col("o_orderkey").as("lk"), col("o_totalprice").as("lprice"))
    val right = Tables.load(spark, sfDir, "orders")
      .filter(col("o_orderkey").between(201, 800))
      .select(col("o_orderkey").as("rk"), col("o_orderpriority").as("rprio"))

    val scaled = PositionalJoin.positionalJoin(
      left, right, Seq(col("lk")), Seq(col("rk")))
    // naive global-window reference
    import org.apache.spark.sql.expressions.Window
    val l = left.withColumn("pos", row_number().over(Window.orderBy(col("lk"))).cast("long"))
    val r = right.withColumn("pos", row_number().over(Window.orderBy(col("rk"))).cast("long"))
    val naive = l.join(r, Seq("pos"), "full_outer")

    val cols = Seq("pos", "lk", "lprice", "rk", "rprio").map(col)
    assert(scaled.select(cols: _*).exceptAll(naive.select(cols: _*)).count() == 0)
    assert(naive.select(cols: _*).exceptAll(scaled.select(cols: _*)).count() == 0)

    // Plan shape: the DATA path sorts under rangepartitioning + a window
    // hash-partitioned by __pid — never a global sort. The only
    // SinglePartition allowed is the boundary-carry prefix sum over the
    // O(partitions) per-partition-count summary, i.e. it must sit directly
    // on an Aggregate, not on the scan/sort path.
    val plan = executed(PositionalJoin.globalIndex(left, Seq(col("lk")), "pos"))
    assert(plan.contains("rangepartitioning"), s"no range repartition:\n$plan")
    assert(plan.contains("hashpartitioning(__pid"),
      s"data window not partitioned by __pid:\n$plan")
    val lines = plan.linesIterator.toVector
    val spIdx = lines.indices.filter(i => lines(i).contains("Exchange SinglePartition"))
    assert(spIdx.size <= 1, s"multiple SinglePartition stages:\n$plan")
    spIdx.foreach { i =>
      val below = lines.slice(i + 1, i + 4).mkString("\n")
      assert(below.contains("Aggregate"),
        s"SinglePartition not over the summary aggregate:\n$plan")
    }
    // and the naive form DOES have the scale-killer, proving the assertion
    // distinguishes the shapes
    val naivePlan = executed(l)
    assert(naivePlan.contains("SinglePartition") &&
      !naivePlan.contains("hashpartitioning(__pid"))
  }
}
