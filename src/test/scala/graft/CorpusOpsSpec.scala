package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Invariants for the corpus-hygiene suite (p25–p28): decontamination,
  * repetition signals, shard layout, random projection. The exact-value
  * check is the DuckDB oracle (local_check / driver); here we assert the
  * structural properties that must hold at any scale. */
class CorpusOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  test("p25 decontaminate: ratios in (0,1], no eval docs in output") {
    val df = run("p25_decontaminate").cache()
    assert(df.count() > 0)
    assert(df.filter(col("contam_ratio") <= 0 || col("contam_ratio") > 1).count() === 0)
    assert(df.filter(pmod(col("doc_id"), lit(17)) === 0).count() === 0)
    assert(df.filter(col("n_contaminated") > col("n_shingles")).count() === 0)
    df.unpersist()
  }

  test("p25 decontaminate: eval docs flag themselves via shared shingles") {
    // every doc whose text equals an eval doc's text must be flagged ~100%
    val docs = Tables.load(spark, sfDir, "documents")
    val evalTexts = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
      .select(col("text")).distinct()
    val dupOfEval = docs.filter(pmod(col("doc_id"), lit(17)) =!= 0)
      .join(evalTexts, "text").select("doc_id")
    val flagged = run("p25_decontaminate")
      .filter(col("contam_ratio") === 1.0).select("doc_id")
    assert(dupOfEval.exceptAll(flagged).count() === 0)
  }

  test("p26 repetition: one row per doc, ratios bounded, exact-dup text has dup_char_ratio 1") {
    val df = run("p26_repetition_signals").cache()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() === nDocs)
    assert(df.filter(col("dup_sent_ratio") < 0 || col("dup_sent_ratio") >= 1).count() === 0)
    assert(df.filter(col("dup_char_ratio") < 0 || col("dup_char_ratio") > 1).count() === 0)
    assert(df.filter(col("max_word_len") < 1 || col("mean_word_len") < 1).count() === 0)
    df.unpersist()
  }

  test("p27 shard assignment: total preserved, shards balanced, positions dense") {
    val df = run("p27_shard_assignment").cache()
    val nDocs = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() === nDocs)
    assert(df.select("shard_id").distinct().count() <= 16)
    // positions within each shard are exactly 0..n-1
    val bad = df.groupBy("shard_id")
      .agg(count(lit(1)).as("n"), max("pos_in_shard").as("mx"), min("pos_in_shard").as("mn"),
        countDistinct("pos_in_shard").as("nd"))
      .filter(col("mn") =!= 0 || col("mx") =!= col("n") - 1 || col("nd") =!= col("n"))
    assert(bad.count() === 0)
    // deterministic across runs
    val again = run("p27_shard_assignment")
    assert(df.exceptAll(again).count() === 0)
    df.unpersist()
  }

  test("p27 shard assignment plan has no single-partition global window") {
    val plan = run("p27_shard_assignment").queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      s"global-window bottleneck in plan:\n$plan")
  }

  test("TrainingPipeline.decontaminate drops exactly the docs p25 flags at the threshold") {
    val docs = Tables.load(spark, sfDir, "documents")
    val corpus = docs.filter(pmod(col("doc_id"), lit(17)) =!= 0)
    val evalDocs = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
    val kept = graft.pipeline.TrainingPipeline(corpus)
      .decontaminate(evalDocs, maxRatio = 0.5).result
    val flagged = run("p25_decontaminate").filter(col("contam_ratio") >= 0.5)
    assert(kept.count() === corpus.count() - flagged.count())
    assert(kept.select("doc_id").intersect(flagged.select("doc_id")).count() === 0)
  }

  test("TrainingPipeline.filterRepetition agrees with p26's dup_sent_ratio") {
    val docs = Tables.load(spark, sfDir, "documents")
    val kept = graft.pipeline.TrainingPipeline(docs).filterRepetition(0.0).result
    val expected = run("p26_repetition_signals")
      .filter(col("dup_sent_ratio") === 0.0).count()
    assert(kept.count() === expected)
    // threshold 1.0 is a no-op gate (ratio is always < 1)
    assert(graft.pipeline.TrainingPipeline(docs).filterRepetition(1.0)
      .result.count() === docs.count())
  }

  test("TrainingPipeline.shardBy(16) reproduces the p27 assignment") {
    val docs = Tables.load(spark, sfDir, "documents")
    val piped = graft.pipeline.TrainingPipeline(docs).shardBy(16)
      .result.select(col("doc_id"), col("shard_id"), col("pos_in_shard"))
    val declared = run("p27_shard_assignment")
      .select(col("doc_id"), col("shard_id"), col("pos_in_shard"))
    assert(piped.exceptAll(declared).count() === 0)
    assert(declared.exceptAll(piped).count() === 0)
  }

  test("p29 domain mix: per-source quota met exactly, ranks dense, flatter than input") {
    val df = run("p29_domain_mix").cache()
    // each source contributes exactly n_target docs with ranks 1..n_target
    val bad = df.groupBy("source")
      .agg(count(lit(1)).as("n"), max("rk").as("mx"), min("rk").as("mn"),
        first("n_target").as("t"))
      .filter(col("n") =!= col("t") || col("mx") =!= col("t") || col("mn") =!= 1)
    assert(bad.count() === 0)
    // α = 0.5 flattens: the biggest source's sampled share never exceeds
    // its corpus share (equality when sources are uniform, as in sf0.x)
    val top = df.groupBy("source")
      .agg(first("n_docs").as("n_docs"), first("n_target").as("n_target"))
      .orderBy(col("n_docs").desc).head()
    val totDocs = Tables.load(spark, sfDir, "documents").count().toDouble
    val totSampled = df.count().toDouble
    assert(top.getAs[Long]("n_target") / totSampled <=
      top.getAs[Long]("n_docs") / totDocs + 1e-12)
    df.unpersist()
  }

  test("p28 random projection: one row per vector, projections finite and non-degenerate") {
    val df = run("p28_random_projection").cache()
    val nVecs = Tables.load(spark, sfDir, "embeddings").count()
    assert(df.count() === nVecs)
    val projCols = (0 until 8).map(i => col(s"proj_$i"))
    assert(df.filter(projCols.map(c => isnan(c) || c.isNull).reduce(_ || _)).count() === 0)
    // non-degenerate: each projected dimension has spread
    val devs = projCols.zipWithIndex.map { case (c, i) => stddev(c).as(s"s_$i") }
    val stats = df.agg(devs.head, devs.tail: _*).head()
    (0 until 8).foreach(i => assert(stats.getDouble(i) > 0))
    df.unpersist()
  }

  test("p54 hard negatives: 3 per query, every negative's label differs from the query's") {
    val df = run("p54_hard_negatives").cache()
    val perQuery = df.groupBy(col("query_id")).count().collect()
    assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) === 3))
    val qLabels = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id").as("query_id"), col("label").as("qlabel"))
    assert(df.join(qLabels, "query_id")
      .filter(col("label") === col("qlabel")).count() === 0)
    df.unpersist()
  }

  test("p55 vocab drift: probabilities valid, drift descending, counts consistent") {
    val rows = run("p55_vocab_drift").collect()
    assert(rows.length === 20)
    val drifts = rows.map(_.getDouble(5))
    assert(drifts.sameElements(drifts.sortBy(-_)))
    rows.foreach { r =>
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
      assert(r.getDouble(4) >= 0.0 && r.getDouble(4) <= 1.0)
      assert(r.getLong(1) + r.getLong(2) > 0) // term occurs in some snapshot
    }
  }

  test("p56 mixing weights: both distributions sum to 1, temperature flattens the head") {
    val rows = run("p56_mixing_weights").collect()
    val pRaw = rows.map(_.getDouble(3))
    val pTemp = rows.map(_.getDouble(4))
    assert(math.abs(pRaw.sum - 1.0) < 1e-9 && math.abs(pTemp.sum - 1.0) < 1e-9)
    // α<1 shrinks the largest source's share and grows the smallest's
    assert(pTemp.max <= pRaw.max + 1e-12)
    assert(pTemp.min >= pRaw.min - 1e-12)
  }

  test("p58 shingle novelty: only new-snapshot docs, ratios in [0,1], counts bounded") {
    val df = run("p58_shingle_novelty").cache()
    assert(df.count() > 0)
    assert(df.filter(pmod(col("doc_id"), lit(2)) === 0).count() === 0)
    assert(df.filter(col("n_novel") > col("n_shingles")).count() === 0)
    assert(df.filter(col("novelty_ratio") < 0 || col("novelty_ratio") > 1).count() === 0)
    df.unpersist()
  }

  test("p59 eval proximity: no eval vectors among candidates, cosine descending") {
    val rows = run("p59_eval_proximity").collect()
    assert(rows.length === 20)
    assert(rows.forall(_.getLong(0) >= 64L)) // corpus side only
    assert(rows.forall(_.getLong(1) < 64L)) // nearest neighbor is an eval vector
    val cos = rows.map(_.getDouble(2))
    assert(cos.sameElements(cos.sortBy(-_)))
    assert(cos.forall(c => c >= -1.0000001 && c <= 1.0000001))
  }

  test("p60 data card stats: per-source totals and quantiles are consistent") {
    val rows = run("p60_data_card_stats").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nDocs, total, mean) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(math.abs(mean - total.toDouble / nDocs) < 1e-9)
      assert(r.getDouble(4) <= r.getDouble(5)) // p50 <= p95
      assert(r.getLong(6) >= 1L)
    }
    val totalDocs = rows.map(_.getLong(1)).sum
    assert(totalDocs === Tables.load(spark, sfDir, "documents").count())
  }

  test("p64 boilerplate shingles: df descending and bounded by corpus size") {
    val rows = run("p64_boilerplate_shingles").collect()
    assert(rows.length === 20)
    val n = Tables.load(spark, sfDir, "documents").count()
    val dfs = rows.map(_.getLong(1))
    assert(dfs.forall(d => d >= 1 && d <= n))
    assert(dfs.sameElements(dfs.sortBy(-_)))
    rows.foreach(r => assert(math.abs(r.getDouble(2) - r.getLong(1).toDouble / n) < 1e-9))
  }

  test("p57 length outliers: every flagged doc is outside its source's [q05,q95] band") {
    val df = run("p57_length_outliers").cache()
    assert(df.count() > 0)
    assert(df.filter(col("n_chars") >= col("lo") && col("n_chars") <= col("hi"))
      .count() === 0)
    // a 5%/95% band flags ~10% asymptotically; tiny strata (tens of docs
    // per source at this sf) round the interpolated cut to ±1 doc each side
    val total = Tables.load(spark, sfDir, "documents").count()
    assert(df.count() <= (total * 0.2).toLong)
    df.unpersist()
  }
}
