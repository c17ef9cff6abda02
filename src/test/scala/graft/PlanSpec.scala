package graft

import org.scalatest.funsuite.AnyFunSuite

/** Physical-plan quality gates — the 100 TB design invariants, asserted on
  * the actual optimized plans so a regression (lost pushdown, lost broadcast,
  * lost top-k fusion, codegen fallout) fails CI rather than surfacing as a
  * 10× slowdown at scale. */
class PlanSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def qe(name: String) =
    SparkEntry.queries(name)(spark, sfDir)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution

  private def plan(name: String): String = qe(name).executedPlan.toString

  /** codegen-mode explain: "Found N WholeStageCodegen subtrees" + the
    * generated code itself. */
  private def codegen(name: String): String =
    qe(name).explainString(org.apache.spark.sql.execution.ExplainMode.fromString("codegen"))

  test("q06 global agg: filters are pushed into the parquet scan") {
    val p = plan("q06_global_agg")
    assert(p.contains("PushedFilters:"), "no pushed filters section")
    assert(p.contains("GreaterThanOrEqual(l_shipdate") || p.contains("l_shipdate"),
      "shipdate filter not pushed")
  }

  test("q06 global agg: scan reads only needed columns (pruning)") {
    val p = plan("q06_global_agg")
    val readSchema = p.linesIterator.find(_.contains("ReadSchema")).getOrElse("")
    assert(!readSchema.contains("l_orderkey"),
      s"scan reads unneeded columns: $readSchema")
    assert(readSchema.contains("l_extendedprice"))
  }

  test("q05 6-table join: constant dims are broadcast") {
    val p = plan("q05_join_6table")
    assert(p.contains("BroadcastHashJoin"), "no broadcast join in 6-table plan")
  }

  test("q03 top-k: ORDER BY + LIMIT fuses to TakeOrderedAndProject") {
    val p = plan("q03_join_topk")
    assert(p.contains("TakeOrderedAndProject"), "top-k not fused")
  }

  test("q01 aggregation: partial (map-side) aggregation before the shuffle") {
    val p = plan("q01_agg_pricing_summary")
    assert(p.contains("partial_sum"), "no partial aggregation")
    val cg = codegen("q01_agg_pricing_summary")
    assert(cg.contains("WholeStageCodegen subtrees"), "aggregation fell out of codegen")
  }

  test("native vector expressions stay inside WholeStageCodegen") {
    val cg = codegen("p11_ann_brute_topk")
    assert(cg.contains("WholeStageCodegen subtrees"))
    // the cosine kernel appears in the generated code, not as a UDF call
    assert(plan("p11_ann_brute_topk").contains("veccosine"))
    assert(!plan("p11_ann_brute_topk").toLowerCase.contains("batchevalpython"))
  }

  test("p01 token count is a pure narrow projection (no shuffle before sort)") {
    val df = Tables.load(spark, sfDir, "documents")
    val narrow = SparkEntry.queries("p01_token_count")(spark, sfDir)
      .asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString
    // exactly one exchange, and it's the final rangepartitioning sort
    val exchanges = narrow.linesIterator.count(_.contains("Exchange"))
    assert(exchanges <= 1, s"unexpected shuffles:\n$narrow")
  }

  test("p31 PII redaction and p34 quantization are narrow (one sort exchange max)") {
    Seq("p31_pii_redact", "p34_embedding_quantize").foreach { name =>
      val p = plan(name)
      val exchanges = p.linesIterator.count(_.contains("Exchange"))
      assert(exchanges <= 1, s"$name has unexpected shuffles:\n$p")
      assert(!p.contains("Exchange SinglePartition"), s"$name funnels to one partition")
    }
  }

  test("p32 sentence dedup: hash-keyed window, no single-partition stage") {
    val p = plan("p32_sentence_dedup")
    assert(!p.contains("Exchange SinglePartition"),
      s"sentence dedup funnels through one partition:\n$p")
    // the first-occurrence filter must partition by the sentence hash
    assert(p.contains("hashpartitioning"), "window not hash-partitioned")
  }

  test("p33 sequence packing: windows partition by shard, never globally") {
    val p = plan("p33_sequence_packing")
    assert(!p.contains("Exchange SinglePartition"),
      s"packing funnels through one partition:\n$p")
    assert(p.contains("shard_id"), "running sum not partitioned by shard")
  }

  test("q65 interval join: equi-join on user with pushed type filters") {
    val p = plan("q65_stream_interval_join")
    assert(p.contains("PushedFilters"), "no pushed filters section")
    assert(p.contains("EqualTo(event_type,purchase)") ||
      p.contains("IsNotNull(event_type)"), "event_type filter not pushed to scan")
    assert(!p.toLowerCase.contains("cartesian"),
      "interval join degenerated to a cartesian product")
  }

  test("q75 COLUMNS expansion: pruning reaches the scan (3 columns, not 16)") {
    // the whole point of expanding COLUMNS('regex') pre-planning: the scan
    // must read exactly the matched columns
    val p = plan("q75_columns_regex")
    assert(p.contains("ReadSchema"), "no ReadSchema section")
    val read = p.linesIterator.find(_.contains("ReadSchema")).get
    assert(read.contains("l_orderkey") && read.contains("l_partkey") &&
      read.contains("l_quantity"), s"expanded columns missing from scan: $read")
    assert(!read.contains("l_comment") && !read.contains("l_shipdate"),
      s"COLUMNS expansion failed to prune the scan: $read")
  }

  test("q73 ASOF SQL join: equi-join on the key, no cartesian product") {
    val p = plan("q73_asof_join_sql")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"ASOF rewrite produced a non-equi join:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("BroadcastHashJoin") ||
      p.contains("ShuffledHashJoin"), "no hash/merge equi-join in the ASOF plan")
  }

  test("micro_sort two-phase rank: no single-partition full-data window") {
    val p = plan("micro_sort_int")
    // every Window in the plan must be partitioned (a global rank window
    // would read "Window [... ORDER BY ...]" with an empty partition spec
    // under an Exchange SinglePartition) — the round-1 scale-killer
    assert(!p.contains("Exchange SinglePartition"),
      s"single-partition exchange in micro_sort plan:\n$p")
    assert(p.contains("rangepartitioning"), "range partition phase missing")
  }

  test("p08 PPJoin: candidates come from an equi-join, never a cartesian") {
    val p = plan("p08_ngram_jaccard_pairs")
    assert(!p.contains("CartesianProduct"), s"cartesian in PPJoin plan:\n$p")
    assert(!p.contains("BroadcastNestedLoopJoin"),
      s"nested-loop join in PPJoin plan:\n$p")
  }

  test("p13 vec_sum: map-side partial aggregation before the shuffle") {
    val p = plan("p13_label_centroids")
    assert(p.contains("partial_vecsumagg") || p.contains("ObjectHashAggregate"),
      s"no partial object aggregate in p13 plan:\n$p")
    assert(!p.contains("Generate explode") && !p.contains("PosExplode"),
      s"p13 still explodes vectors:\n$p")
  }

  test("semi/anti joins are planned as such (not inner + dedup)") {
    assert(plan("q04_exists_semijoin").contains("LeftSemi"))
    assert(plan("q22_substring_antijoin").contains("LeftAnti"))
  }

  test("p44/p71: no window partitioned by the gram hash (skew-safe dup marking)") {
    // Round-11 de-skew (singleton-complement shape, see TermStats.gramAgg
    // ledger): duplicate-gram statistics must ride ONE map-side-collapsing
    // aggregate keyed by h, never `count(*) OVER (PARTITION BY h)` — a hot
    // boilerplate gram would funnel every occurrence into one window task,
    // and AQE skew-split applies to shuffle joins, not windows. The only
    // join is singleton-rows → doc-sized frame on uniform doc_id.
    Seq("p44_dup_span_grams", "p71_dup_span_removal").foreach { name =>
      val p = plan(name)
      assert(!p.linesIterator.exists(l => l.contains("Window") && l.contains("h#")),
        s"$name marks duplicates with a window over the gram hash:\n$p")
      assert(p.contains("partial_count"),
        s"$name dup counting lost map-side partial aggregation:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
        p.contains("BroadcastHashJoin"),
        s"$name singleton join is not an equi-join:\n$p")
      // the gram stream must be scanned exactly once: one Generate
      // (explode) in the whole plan
      assert("Generate".r.findAllIn(p).size <= 1,
        s"$name scans the gram stream more than once:\n$p")
    }
  }

  test("p40/p42: consumers derive from the cached token arrays; no Expand, no exploded-stream cache") {
    // Round-10 invariants of the tf-frame rewrite (5.0 → 2.6 s at sf1):
    // every consumer re-reads the SHARED token-array cache (cheap explode
    // + map-side-collapsing aggregate per consumer — AQE does not dedup
    // stages above an InMemoryRelation, so asserting a single subtree
    // would be wishful), the Expand-doubled countDistinct pass is gone,
    // and nothing caches the exploded 50M-row stream anymore.
    graft.pipeline.Pins.releaseAll(spark)
    try Seq("p40_tfidf_top_terms", "p42_unigram_logprob").foreach { name =>
      val p = plan(name)
      assert("InMemoryTableScan".r.findAllIn(p).size >= 2,
        s"$name consumers must read the shared token-array cache:\n$p")
      assert(!p.contains("Expand"),
        s"$name must not route statistics through an Expand:\n$p")
      // every cache scan is the doc-level array frame, not exploded rows
      assert(!p.linesIterator.exists(l =>
          l.contains("InMemoryTableScan") && l.contains("term#")),
        s"$name caches the exploded term stream:\n$p")
    } finally graft.pipeline.Pins.releaseAll(spark)
  }

  test("q21: supplier-count aggregate is two-level, never a multi-distinct Expand") {
    // Two countDistinct aggregates plan through an Expand that doubles
    // the lineitem⋈orders stream before the shuffle; the (orderkey,
    // suppkey) pre-aggregate collapses map-side instead (sf10 measured
    // 10.0 → 6.6 s). ROLLUP/CUBE/GROUPING SETS/UNPIVOT/sliding-window
    // queries keep their Expands — there the operator IS an expand.
    val p = plan("q21_exists_notexists")
    assert(!p.contains("Expand"), s"q21 regressed to a multi-distinct Expand:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"q21 lost map-side partial aggregation:\n$p")
  }

  test("p72 DSIR: log-ratio table broadcasts; bucket marginals keep map-side partials") {
    // The 100 TB shape of importance weighting: the ≤8192-row log-ratio
    // table must BROADCAST onto the corpus-scale (doc, bucket) frame —
    // shuffling that frame on the Zipfian bucket key instead would funnel
    // hot buckets — and every bucket marginal must collapse map-side.
    val p = plan("p72_dsir_weights")
    assert(p.contains("BroadcastHashJoin"),
      s"p72 lost the log-ratio broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"p72 lost map-side partial aggregation:\n$p")
    // the per-doc scoring aggregate is keyed by doc_id (uniform), and no
    // window anywhere
    assert(!p.contains("Window"), s"p72 must not window:\n$p")
  }

  test("p75 quantile prune: windows run on the histogram, thresholds broadcast") {
    // The corpus must collapse map-side onto the (source, score) histogram
    // BEFORE any window touches it: the cumulative-count window's child
    // chain must contain that aggregate (a window directly over the scan
    // would funnel each source through one task at 100 TB), and the
    // per-source threshold table must broadcast back onto the corpus.
    val p = plan("p75_source_quantile_prune")
    assert(p.contains("BroadcastHashJoin"),
      s"p75 lost the threshold broadcast:\n$p")
    assert(p.contains("partial_count"),
      s"p75 lost map-side partial aggregation:\n$p")
    val winIdx = p.indexOf("Window")
    val aggBefore = p.indexOf("HashAggregate", winIdx) // children print below
    assert(winIdx >= 0 && aggBefore >= 0,
      s"p75 window does not sit above the histogram aggregate:\n$p")
  }

  test("p76 bigram surprisal: LM table broadcasts onto the per-doc frame") {
    // Same posture as p42's unigram table: shuffling the corpus-scale
    // (doc, w1, w2, tf) frame on the Zipfian bigram key is the skew trap;
    // the vocab²-bounded logp table broadcasts instead.
    val p = plan("p76_bigram_surprisal")
    assert(p.contains("BroadcastHashJoin"),
      s"p76 lost the LM-table broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"p76 lost map-side partial aggregation:\n$p")
    assert(!p.contains("Window"), s"p76 must not window:\n$p")
    assert(!p.contains("CartesianProduct"), s"p76 has an all-pairs stage:\n$p")
  }

  test("p77 epoch plan: per-source multiplicities broadcast; no window") {
    val p = plan("p77_epoch_mixture_plan")
    assert(p.contains("BroadcastHashJoin"),
      s"p77 lost the plan-table broadcast:\n$p")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      s"p77 lost map-side partial aggregation:\n$p")
    assert(!p.contains("Window"), s"p77 must not window:\n$p")
  }

  test("p74 eval leak rate: raw shingles collapse before the join; no cartesian") {
    val p = plan("p74_eval_leak_rate")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin") ||
      p.contains("BroadcastHashJoin"),
      s"p74 shingle membership is not an equi-join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoop"),
      s"p74 has an all-pairs stage:\n$p")
    assert(p.contains("partial_count"),
      s"p74 lost map-side partial aggregation:\n$p")
  }
}
