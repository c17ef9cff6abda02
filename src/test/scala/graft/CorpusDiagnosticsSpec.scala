package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariant checks for the corpus-diagnostic operators (p66–p70) beyond
  * the driver's SQL-oracle hash match: sampling math, graph accounting,
  * calibration bounds, template membership, padding economics, and the
  * plan shapes that carry the 100 TB story. */
class CorpusDiagnosticsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("p66: deterministic k-sample, keys honor the priority formula") {
    val df = run("p66_weighted_sample").cache()
    val n = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() === math.min(100L, n))
    // rnk is the dense 1..k order of the priority key
    val ranked = df.orderBy(col("rnk")).collect()
    assert(ranked.map(_.getInt(0)).toSeq === (1 to ranked.length))
    assert(ranked.sliding(2).forall {
      case Array(a, b) => a.getDouble(3) <= b.getDouble(3); case _ => true })
    // deterministic: a rerun selects the same docs in the same order
    val again = run("p66_weighted_sample")
    assert(df.exceptAll(again).count() === 0)
    // the key is an exponential clock: always > 0 for u in (0,1)
    assert(df.filter(col("priority") <= 0).count() === 0)
    df.unpersist()
  }

  test("p66: no global sort — the sample fuses to TakeOrdered") {
    val plan = run("p66_weighted_sample")
      .queryExecution.executedPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"expected top-k fusion, got:\n$plan")
  }

  test("p67: degree histogram accounts for every doc and every pair edge") {
    val hist = run("p67_dup_graph_degree").cache()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    val nPairs = run("p06_minhash_lsh_pairs").count()
    val total = hist.agg(sum(col("n_docs"))).collect()(0).getLong(0)
    assert(total === nDocs)
    // sum(degree · n_docs) = 2 · |pairs| (each pair contributes 2 endpoints)
    val mass = hist.agg(sum(col("degree") * col("n_docs"))).collect()(0).getLong(0)
    assert(mass === 2 * nPairs)
    hist.unpersist()
  }

  test("p68: calibration rows are the candidate pairs, errors bounded") {
    val cal = run("p68_minhash_calibration").cache()
    assert(cal.count() === run("p06_minhash_lsh_pairs").count())
    assert(cal.filter(col("est") < 0 || col("est") > 1
      || col("exact") < 0 || col("exact") > 1).count() === 0)
    assert(cal.filter(
      abs(abs(col("est") - col("exact")) - col("abs_err")) > 1e-12).count() === 0)
    cal.unpersist()
  }

  test("p69: every template cluster shares the normalized 8-token header") {
    val docs = Tables.load(spark, sfDir, "documents")
      .withColumn("toks", expr(
        "filter(split(trim(lower(text)), '\\\\s+'), t -> t NOT IN ('a', 'the'))"))
      .withColumn("tpl", concat_ws(" ", slice(col("toks"), 1, 8)))
      .select(col("doc_id"), md5(col("tpl")).as("template_md5"))
    val clusters = run("p69_template_dedup").cache()
    assert(clusters.filter(col("n_docs") < 2).count() === 0)
    // recomputing membership independently reproduces each cluster's size
    val sizes = docs.groupBy(col("template_md5")).count()
    val mismatched = clusters.join(sizes, "template_md5")
      .filter(col("n_docs") =!= col("count")).count()
    assert(mismatched === 0)
    clusters.unpersist()
  }

  test("p70: buckets cover the corpus and padding never loses tokens") {
    val h = run("p70_seqlen_histogram").cache()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(h.agg(sum(col("n_docs"))).collect()(0).getLong(0) === nDocs)
    assert(h.filter(col("real_tokens") > col("padded_tokens")).count() === 0)
    assert(h.filter(col("waste_ratio") < 0 || col("waste_ratio") >= 1).count() === 0)
    val buckets = h.select(col("bucket")).collect().map(_.getLong(0))
    assert(buckets.forall(b => (b & (b - 1)) == 0), "buckets are powers of two")
    h.unpersist()
  }

  test("p70: long docs land on the extended ladder; beyond-cap docs truncate") {
    import spark.implicits._
    import graft.pipeline.CorpusDiagnostics
    // 2 000 tokens → 2048 bucket; 70 000 tokens → truncated to the 65536
    // cap (real == padded, zero waste); tiny doc → 16 bucket. The pre-fix
    // ladder sent both long docs to a 1024 bucket with real > padded.
    val docs = Seq(
      (1L, Seq.fill(2000)("w").mkString(" ")),
      (2L, Seq.fill(70000)("w").mkString(" ")),
      (3L, "only four tokens here")).toDF("doc_id", "text")
    val h = CorpusDiagnostics.seqlenHistogramOf(docs)
      .orderBy(col("bucket")).collect()
    assert(h.map(_.getLong(0)).toSeq === Seq(16L, 2048L, CorpusDiagnostics.MaxSeqLen))
    h.foreach { r =>
      assert(r.getLong(2) <= r.getLong(3), s"real > padded in $r")
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) < 1.0, s"waste out of range in $r")
    }
    // the capped doc pads exactly to the cap: no waste on that bucket
    val capRow = h.last
    assert(capRow.getLong(2) === CorpusDiagnostics.MaxSeqLen
      && capRow.getLong(3) === CorpusDiagnostics.MaxSeqLen)
  }
}
