package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Structural invariants for the round-6 curation/selection wave (the
  * driver oracle pins exact values; these pin the properties that must
  * hold at any scale). */
class CurationSelectionSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  test("p45: banding has perfect recall at the pigeonhole threshold") {
    // brute-force all pairs within hamming <= 3 on a doc subset, and the
    // banded operator must contain every one of them
    // the operator's own fingerprints (shingle-basis 62-bit simhash); the
    // full sf0.001 corpus keeps the brute-force quadratic at ~125k pairs
    val sub = graft.pipeline.CurationSelection
      .simhashFingerprints(spark, sfDir)
    val brute = sub.as("a").join(sub.as("b"),
        col("a.doc_id") < col("b.doc_id") &&
          expr("bit_count(a.h ^ b.h)") <= 3)
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
    val banded = run("p45_simhash_band_pairs")
      .select(col("doc_a"), col("doc_b"))
    assert(brute.exceptAll(banded).count() == 0,
      "banding missed a pair within hamming 3")
    // and nothing above the threshold leaks through
    assert(run("p45_simhash_band_pairs").filter(col("hamming") > 3).isEmpty)
  }

  test("p46: one survivor per cluster, carrying the cluster-max quality") {
    val surv = run("p46_cluster_survivors").cache()
    val clusters = run("p24_dedup_clusters")
    assert(surv.count() == clusters.count())
    assert(surv.select(countDistinct(col("cluster_id"))).head.getLong(0)
      == surv.count())
    // survivor quality is the max: total docs accounted for matches corpus
    assert(surv.agg(sum(col("n_docs"))).head.getLong(0)
      == Tables.load(spark, sfDir, "documents").count())
    surv.unpersist()
  }

  test("p47: ratios bounded, attribution only for contaminated train docs") {
    val at = run("p47_contam_attribution").cache()
    assert(at.filter(col("overlap_ratio") <= 0 || col("overlap_ratio") > 1).isEmpty)
    assert(at.filter(pmod(col("doc_id"), lit(17)) === 0).isEmpty,
      "eval docs must not appear as training rows")
    assert(at.filter(col("n_shared") < 1).isEmpty)
    at.unpersist()
  }

  test("p48: contiguous per-epoch ranks, bounded batches, epoch-distinct order") {
    val sh = run("p48_epoch_shuffle").cache()
    val n = Tables.load(spark, sfDir, "documents").count()
    // ranks are exactly 1..n per epoch
    val perEpoch = sh.groupBy(col("epoch"))
      .agg(count(lit(1)).as("cnt"), min(col("rank_in_epoch")).as("lo"),
        max(col("rank_in_epoch")).as("hi"),
        countDistinct(col("rank_in_epoch")).as("dr"))
      .collect()
    assert(perEpoch.length == 2)
    perEpoch.foreach { r =>
      assert(r.getAs[Long]("cnt") == n && r.getAs[Long]("lo") == 1L &&
        r.getAs[Long]("hi") == n && r.getAs[Long]("dr") == n)
    }
    // batches hold at most 64 rows
    assert(sh.groupBy(col("epoch"), col("batch_id")).count()
      .filter(col("count") > 64).isEmpty)
    // the two epochs really are different permutations
    val agree = sh.filter(col("epoch") === 0).select(col("doc_id"), col("rank_in_epoch"))
      .join(sh.filter(col("epoch") === 1)
        .select(col("doc_id"), col("rank_in_epoch").as("r1")), "doc_id")
      .filter(col("rank_in_epoch") === col("r1")).count()
    assert(agree < n / 10, s"epoch permutations nearly identical: $agree of $n")
    sh.unpersist()
  }
}
