package graft

import graft.scale.Scale
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-technique verification: bucketed joins really avoid the shuffle,
  * salted joins really produce identical results to plain joins. */
class ScaleSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("bucketed co-located join has zero Exchange in the plan") {
    spark.sql("CREATE DATABASE IF NOT EXISTS main")
    spark.sql("DROP TABLE IF EXISTS main.b_orders")
    spark.sql("DROP TABLE IF EXISTS main.b_lineitem")
    Scale.writeBucketed(
      Tables.load(spark, sfDir, "orders"), "main.b_orders", "o_orderkey", 8)
    Scale.writeBucketed(
      Tables.load(spark, sfDir, "lineitem").withColumnRenamed("l_orderkey", "o_orderkey"),
      "main.b_lineitem", "o_orderkey", 8)

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      val joined = spark.table("main.b_orders")
        .join(spark.table("main.b_lineitem"), "o_orderkey")
      val plan = joined
        .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join still shuffles:\n$plan")
      // and it is still correct
      val expected = Tables.load(spark, sfDir, "orders")
        .join(Tables.load(spark, sfDir, "lineitem"),
          col("o_orderkey") === col("l_orderkey")).count()
      assert(joined.count() === expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS main.b_orders")
      spark.sql("DROP TABLE IF EXISTS main.b_lineitem")
    }
  }

  test("salted join returns exactly the plain join's result") {
    val li = Tables.load(spark, sfDir, "lineitem")
      .select(col("l_orderkey").as("okey"), col("l_quantity"))
    val o = Tables.load(spark, sfDir, "orders")
      .select(col("o_orderkey").as("okey"), col("o_orderpriority"))
    val plain = li.join(o, Seq("okey"))
    val salted = Scale.saltedJoin(li, o, Seq("okey"), saltBuckets = 4)
    assert(salted.count() === plain.count())
    assert(salted.select("okey", "l_quantity", "o_orderpriority")
      .exceptAll(plain.select("okey", "l_quantity", "o_orderpriority")).count() === 0)
  }

  test("segmented as-of join equals the plain form on a pathological key") {
    import spark.implicits._
    // one bot key with 20k events (the skew case: plain as-of puts all of
    // them in ONE window task) + normal keys; unique times per key so the
    // match is uniquely defined
    val right = spark.range(0, 20000)
      .select(lit("bot").as("k"), (col("id") * 7L).as("t"), (col("id") + 100000L).as("p"))
      .unionByName(spark.range(0, 50)
        .select(lit("u1").as("k"), (col("id") * 1000L).as("t"), col("id").as("p")))
    val left = spark.range(0, 2000)
      .select(lit("bot").as("k"), (col("id") * 71L + 3L).as("t"))
      .unionByName(spark.range(0, 20)
        .select(lit("u1").as("k"), (col("id") * 2500L + 1L).as("t")))
      // and left rows BEFORE any right row → must stay unmatched (null)
      .unionByName(Seq(("bot", -5L), ("u1", -1L)).toDF("k", "t"))

    val plain = graft.operators.TemporalJoins
      .asofJoin(left, right, "k", "t", "t", "p")
      .select(col("k"), col("__t"), col("__match"), col("__match_t"))
    val seg = Scale.segmentedAsofJoin(left, right, "k", "t", "t", "p",
      segmentSeconds = 600L)

    val pRows = plain.collect().map(_.toSeq).toSet
    val sRows = seg.collect().map(_.toSeq).toSet
    assert(sRows === pRows)
    assert(plain.count() === left.count()) // every left row represented
    // segmentation actually spreads the hot key: >1 distinct segment
    assert(seg.count() === left.count())
  }

  test("banded range frame equals the global window and avoids SinglePartition") {
    import org.apache.spark.sql.expressions.Window
    val orders = Tables.load(spark, sfDir, "orders")
    val gw = Window.orderBy(col("o_orderkey")).rangeBetween(-5, 0)
    val global = orders
      .withColumn("n_in_range", count(lit(1)).over(gw))
      .withColumn("sum_in_range",
        sum(floor(col("o_totalprice")).cast("long")).over(gw))
      .select(col("o_orderkey"), col("n_in_range"), col("sum_in_range"))
    val banded = Scale.bandedRangeFrame(orders, "o_orderkey", width = 5,
      w => Seq(
        count(lit(1)).over(w).as("n_in_range"),
        sum(floor(col("o_totalprice")).cast("long")).over(w).as("sum_in_range")),
      bucketSize = 64) // small buckets → many boundary crossings exercised
      .select(col("o_orderkey"), col("n_in_range"), col("sum_in_range"))
    assert(banded.exceptAll(global).count() === 0)
    assert(global.exceptAll(banded).count() === 0)
    val plan = banded
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"banded range frame still has a single-partition stage:\n$plan")
  }

  test("banded running positional state equals the single window; no full-table window on the low-card key") {
    import org.apache.spark.sql.expressions.Window
    val e = Tables.load(spark, sfDir, "events")
      .withColumn("v",
        when(pmod(col("event_id"), lit(5)) === 0, lit(null).cast("double"))
          .otherwise(col("value")))
    val w = Window.partitionBy(col("event_type")).orderBy(col("ts"), col("event_id"))
    val single = e.select(col("event_id"),
      nth_value(col("event_id"), 3).over(w).as("nth3"),
      first(col("v"), ignoreNulls = true).over(w).as("first_nn"),
      last(col("v"), ignoreNulls = true).over(w).as("last_nn"))
    // hour buckets (not day) → many boundary crossings exercised
    val hour = expr(
      "(unix_micros(CAST(ts AS TIMESTAMP)) - " +
        "pmod(unix_micros(CAST(ts AS TIMESTAMP)), 3600000000L)) div 3600000000L")
    val banded = Scale.bandedRunningPositional(e, "event_type", hour,
        Seq(col("ts"), col("event_id")), valCol = "v", nthCol = "event_id",
        n = 3, firstName = "first_nn", lastName = "last_nn", nthName = "nth3")
      .select(col("event_id"), col("nth3"), col("first_nn"), col("last_nn"))
    assert(banded.exceptAll(single).count() === 0)
    assert(single.exceptAll(banded).count() === 0)
    // no Window over the FULL events table may key on event_type alone:
    // every such window must sit above an Aggregate (the bucket-summary
    // carry), so its input is O(buckets), not O(rows)
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, LogicalPlan, Window => LWindow}
    val plan = banded
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.optimizedPlan
    def hasAggBelow(p: LogicalPlan): Boolean =
      p.collectFirst { case _: Aggregate => () }.isDefined
    plan.foreach {
      case lw: LWindow if lw.partitionSpec.length == 1 &&
          lw.partitionSpec.head.references.map(_.name).toSeq == Seq("event_type") =>
        assert(hasAggBelow(lw.child),
          s"window keyed on event_type alone reads the full table:\n$lw")
      case _ => ()
    }
  }

  test("connectedComponents collapses a 200-link chain within O(log n) rounds") {
    import spark.implicits._
    // chain 0-1-2-...-100 plus a disjoint 100-node chain: min-label
    // propagation needs ~chain-length rounds; the alternating-star
    // algorithm must finish well inside 12, and the two components must
    // resolve to their own minima
    val chain = ((0 until 100).map(i => (i.toLong, i.toLong + 1)) ++
      (200 until 300).map(i => (i.toLong, i.toLong + 1))).toDF("src", "dst")
    val comps = Scale.connectedComponents(chain, maxRounds = 12)
      .persist()
    assert(comps.count() === 202)
    assert(comps.filter(col("node") <= 100 && col("component") =!= 0L).count() === 0)
    assert(comps.filter(col("node") >= 200 && col("component") =!= 200L).count() === 0)
    comps.unpersist()
  }

  test("star-based dedup clustering equals min-label fixpoint on the LSH graph") {
    val viaStar = graft.pipeline.DedupQueries.dedupClustersStar(spark, sfDir)
    val viaProp = graft.pipeline.DedupQueries.dedupClustersConverged(spark, sfDir)
    assert(viaStar.exceptAll(viaProp).count() === 0)
    assert(viaProp.exceptAll(viaStar).count() === 0)
  }

  test("min-label propagation keeps a flat plan across 30+ rounds") {
    import spark.implicits._
    // a 32-node chain forces ~31 min-label rounds; with `persist` instead
    // of `localCheckpoint` the logical plan doubles per round (2^31 copies
    // of the base plan — stringification alone OOMs the driver), so this
    // test both converging AND returning a tiny plan is the regression
    // gate for the lineage fix
    val n = 32
    val half = (0 until n - 1).map(i => (i.toLong, i.toLong + 1)).toDF("src", "dst")
    val edges = half.unionByName(half.select(col("dst").as("src"), col("src").as("dst")))
    val init = (0 until n).map(_.toLong).toDF("doc_id")
      .withColumn("label", col("doc_id"))
    val result = graft.pipeline.DedupQueries.propagateToFixpoint(edges, init, maxRounds = 40)
    assert(result.collect().map(_.getLong(1)).toSet === Set(0L),
      "chain did not converge to its minimum label")
    val planNodes = result
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.logical.collect { case p => p }.size
    assert(planNodes <= 5,
      s"lineage not truncated: final plan has $planNodes nodes after 30+ rounds")
  }

  test("key skew histogram finds the heaviest keys") {
    val skew = Scale.keySkew(Tables.load(spark, sfDir, "lineitem"), "l_suppkey", 5)
    val rows = skew.collect()
    assert(rows.length === 5)
    // descending
    assert(rows.sliding(2).forall(p => p(0).getLong(1) >= p(1).getLong(1)))
  }

  // Round-15 (r14 verdict task 7): the two-level coarse-then-fine
  // assignment engaged by a REAL consumer end-to-end — p49 SemDeDup with
  // the centroid ceiling forced below its corpus-scaled k (= 64 at this
  // corpus; ceiling 10 ⇒ coarse k' = 8 ≤ 10 < 64 routes every assign
  // through the IVF path). The pin is completion + output contract, not
  // agreement with the direct path: IVF reshuffles cell membership by
  // design (here 17 dup rows vs 24 direct, 9 common — a tiny 500-vector
  // corpus at k=64 maximizes straddling), and the exact algorithm is
  // already pinned against a driver-side reference in ClusteringSeedSpec.
  test("p49 SemDeDup completes end-to-end through the two-level path") {
    val p49 = graft.pipeline.SemanticOps.all.find(_.name == "p49_semdedup").get
    spark.conf.set("spark.graft.clustering.maxCells", "10")
    try {
      graft.pipeline.Pins.releaseAll(spark)
      val rows = p49.fn(spark, sfDir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
      assert(rows.nonEmpty, "two-level SemDeDup produced no dup rows")
      // contract: dup_of is the minimum passing neighbor → strictly
      // smaller id; one row per deduplicated vector
      assert(rows.forall { case (vid, dupOf, _) => dupOf < vid }, rows.take(5))
      assert(rows.map(_._1).distinct.length === rows.length)
    } finally {
      spark.conf.unset("spark.graft.clustering.maxCells")
      graft.pipeline.Pins.releaseAll(spark)
    }
  }

  test("groupedExactQuantile equals percentile with no percentile agg buffer") {
    val orders = Tables.load(spark, sfDir, "orders")
    val qs = Seq(0.0 -> "q00", 0.05 -> "q05", 0.5 -> "q50",
      0.95 -> "q95", 1.0 -> "q100")
    val viaScale = Scale.groupedExactQuantile(
      orders, "o_orderpriority", "o_totalprice", qs)
    val viaPercentile = orders.groupBy(col("o_orderpriority")).agg(
      expr("percentile(o_totalprice, 0.0)").as("q00"),
      expr("percentile(o_totalprice, 0.05)").as("q05"),
      expr("percentile(o_totalprice, 0.5)").as("q50"),
      expr("percentile(o_totalprice, 0.95)").as("q95"),
      expr("percentile(o_totalprice, 1.0)").as("q100"))
    val a = viaScale.collect().map(r => r.getString(0) ->
      (1 to 5).map(r.getDouble)).toMap
    val b = viaPercentile.collect().map(r => r.getString(0) ->
      (1 to 5).map(r.getDouble)).toMap
    assert(a.keySet === b.keySet)
    for (k <- a.keySet; i <- 0 until 5)
      assert(math.abs(a(k)(i) - b(k)(i)) < 1e-9,
        s"quantile mismatch for group $k at ${qs(i)._2}: ${a(k)(i)} vs ${b(k)(i)}")
    // the point of the operator: NO exact-percentile map buffer anywhere —
    // aggregation state is constant-size (count/min), the only data-sized
    // structure is the spillable window sort over the distinct-value
    // histogram
    val plan = viaScale.queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("percentile"),
      s"plan still carries a percentile buffer:\n$plan")
  }

  test("exactQuantile (ungrouped) equals global percentile") {
    val orders = Tables.load(spark, sfDir, "orders")
    val got = Scale.exactQuantile(orders, "o_totalprice",
      Seq(0.25 -> "q25", 0.5 -> "q50", 0.75 -> "q75")).collect().head
    val want = orders.selectExpr(
      "percentile(o_totalprice, 0.25)", "percentile(o_totalprice, 0.5)",
      "percentile(o_totalprice, 0.75)").collect().head
    for (i <- 0 until 3)
      assert(math.abs(got.getDouble(i) - want.getDouble(i)) < 1e-9)
  }

  test("groupedExactQuantile ignores NULL values like percentile") {
    import spark.implicits._
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(10.0)), ("b", None)).toDF("k", "v")
    val dir = java.nio.file.Files.createTempDirectory("geq-null").toString
    df.write.mode("overwrite").parquet(dir)
    val src = spark.read.parquet(dir)
    val r = Scale.groupedExactQuantile(src, "k", "v", Seq(0.5 -> "med"))
      .collect().map(x => x.getString(0) -> x.getDouble(1)).toMap
    assert(r === Map("a" -> 2.0, "b" -> 10.0))
  }
}
