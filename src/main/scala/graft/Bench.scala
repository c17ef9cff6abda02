package graft
import org.apache.spark.sql.SparkSession

/** Per-round benchmark harness. Methodology (round-1 verdict item 4, round-4
  * verdict item 2):
  *  - every query executes through a **materializing** noop write — all
  *    result rows are produced and serialized into the sink interface, so a
  *    final ORDER BY is not eliminated the way it is under `count()` and the
  *    timing matches the reference harness, which materializes full Arrow
  *    results (packages/benchmarks/src/system/duckdb_sync_benchmarks.ts).
  *  - an untimed warm-up pass runs a representative multi-way join and a
  *    window query over the actual tables BEFORE any timing, so the first
  *    timed queries don't absorb JVM/codegen warm-up and cold file I/O
  *    (rounds 3 and 4 both showed a phantom "regression" set that was just
  *    whichever join-heavy queries ran first).
  *  - each query is sampled SPARK_GRAFT_SAMPLES times (default 3, like
  *    buffalo-bench's multi-cycle runs) and the **min** is reported (see
  *    the sampling comment below — co-tenant noise is additive). Queries
  *    whose first sample exceeds 10 s take that single sample — the same
  *    early-break scripts/bench_duck.py applies, so both sides of the ratio
  *    use the same estimator on heavy queries.
  *  - per-query sample SPREAD (max-min over the samples actually taken) is
  *    emitted alongside the minima, so measurement noise is visible in the
  *    artifact instead of reading as regression.
  *  - pinned caches are cleared between queries so timings are independent.
  * Emits ONE JSON line with the load-bearing dicts LAST:
  * {"metric":"total","unit":"sec","sf":...,"samples":k,
  *  "spread":{name:sec,...},"queries":{name:sec,...},"value":total}.
  * Field order matters: the driver keeps only the TAIL of long output, so
  * the per-query minima ("queries") and the total ("value") must come after
  * the diagnostic spread dict — round 5's artifact had the order reversed
  * and the truncated file preserved only noise spreads. The SAME line is
  * additionally written in full to `SPARK_GRAFT_BENCH_OUT` (default
  * `BENCH_FULL.json`, committed per round) because even tail-last ordering
  * loses the head of the queries dict to the driver's 2 KB window.
  */
object Bench {
  private val HeavyCutoffSec = 10.0 // matches scripts/bench_duck.py

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val samples = sys.env.getOrElse("SPARK_GRAFT_SAMPLES", "3").toInt.max(1)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case _: Throwable => false }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // outside the timed window: releasing another query's pinned caches
      // is harness work, not query work
      spark.catalog.clearCache()
      if (ok) elapsed else -1.0
    }

    // Untimed warm-up: exercise the code paths the timed queries use —
    // whole-stage codegen JIT, shuffle machinery, broadcast exchange,
    // window exec, and the parquet footers/page cache of the big tables.
    // A trivial range-sum (the old warm-up) warms none of the join path,
    // which is why the first join-heavy queries looked "regressed" in
    // rounds 3 and 4.
    try {
      import org.apache.spark.sql.functions._
      val li = Tables.load(spark, sfDir, "lineitem")
      val ord = Tables.load(spark, sfDir, "orders")
      val cust = Tables.load(spark, sfDir, "customer")
      li.join(ord, li("l_orderkey") === ord("o_orderkey"))
        .join(cust, ord("o_custkey") === cust("c_custkey"))
        .groupBy(cust("c_custkey")).agg(sum(li("l_quantity")).as("q"))
        .write.format("noop").mode("overwrite").save()
      import org.apache.spark.sql.expressions.Window
      ord.withColumn("rk",
          row_number().over(Window.partitionBy("o_custkey").orderBy("o_orderkey")))
        .filter(col("rk") <= 2)
        .write.format("noop").mode("overwrite").save()
    } catch { case e: Throwable =>
      System.err.println(s"[bench] warm-up failed (continuing): ${e.getMessage}")
    }
    spark.catalog.clearCache()

    // optional comma-separated prefix filter for local iteration
    // (driver never sets it → full suite)
    val only = sys.env.get("SPARK_GRAFT_ONLY").map(_.split(",").toSeq)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.exists(n.startsWith)))
    if (names.isEmpty) {
      println(s"""{"metric":"total","unit":"sec","sf":"$sfDir","samples":$samples,"spread":{},"queries":{},"value":0.0}""")
      spark.stop()
      return
    }

    val results = names.map { name =>
      // Early-break on heavy queries (first clean sample > 10 s): compute-
      // dominated runs don't need repeat sampling, and the break mirrors
      // bench_duck.py so min-over-k is taken over the SAME k on both sides.
      val times = Seq.newBuilder[Double]
      var taken = 0
      var break_ = false
      while (taken < samples && !break_) {
        val t = runOnce(name)
        times += t
        taken += 1
        if (t >= HeavyCutoffSec) break_ = true
      }
      val ok = times.result().filter(_ >= 0)
      // Min over samples, not median: on a shared box, co-tenant load / GC
      // pauses are strictly ADDITIVE noise, so the smallest observation is
      // the least-contaminated estimate of the query's true cost (r1 + r2
      // driver runs both recorded 3–14× inflation on hot queries vs an
      // isolated re-run; the min is robust to one loaded sample, the
      // median is not when two of three samples land under load).
      val best = if (ok.isEmpty) -1.0 else ok.min
      val spread = if (ok.size < 2) 0.0 else ok.max - ok.min
      (name, best, spread)
    }
    // ms precision everywhere: sub-ms digits are pure noise at these
    // runtimes, and the shorter line lets the driver's bounded tail window
    // keep ~3× more per-query entries.
    def ms(v: Double): Double =
      BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble
    def fmt(xs: Seq[(String, Double)]): String =
      xs.map { case (k, v) => "\"" + k + "\":" + ms(v) }.mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val qs = fmt(results.map(r => (r._1, r._2)))
    val sp = fmt(results.map(r => (r._1, r._3)))
    val line = s"""{"metric":"total","unit":"sec","sf":"$sfDir","samples":$samples,"spread":$sp,"queries":$qs,"value":${ms(total)}}"""
    println(line)
    // The driver keeps only a bounded TAIL of stdout, so the full artifact
    // is also written to a repo file (committed per round) — every
    // per-query minimum stays readable regardless of truncation.
    sys.env.get("SPARK_GRAFT_BENCH_OUT").orElse(Some("BENCH_FULL.json"))
      .foreach { p =>
        try java.nio.file.Files.writeString(java.nio.file.Paths.get(p), line + "\n")
        catch { case e: Throwable =>
          System.err.println(s"[bench] could not write $p: ${e.getMessage}")
        }
      }
    spark.stop()
  }
}
