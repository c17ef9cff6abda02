package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic checks for the data-pipeline operators (dedup / similarity /
  * text) that have no SQL oracle — verify their mathematical invariants. */
class PipelineSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) = SparkEntry.queries(name)(spark, sfDir)

  // Round-12 (ADVICE): the singleton-complement p44/p71 rewrite must agree
  // with the old explode arm on NULL-text documents — keeping them gave
  // size(NULL) = -1, i.e. n_grams = -1, n_dup = -1, dup_ratio = 1.0
  // garbage rows. Both arms now drop NULL-text docs (as the gram explode
  // always did), so the doc simply has no row.
  test("p44/p71: NULL-text documents produce no rows, never -1 gram counts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nulltext")
    try {
      import spark.implicits._
      val dup = "the quick brown fox jumps over the lazy dog again and again"
      Seq(
        (1L, dup, "en", "web", dup.length.toLong),
        (2L, dup, "en", "web", dup.length.toLong),
        (3L, null.asInstanceOf[String], "en", "web", 0L),
        (4L, "completely unrelated short text with its own words", "en", "web", 50L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      for (name <- Seq("p44_dup_span_grams", "p71_dup_span_removal")) {
        val out = SparkEntry.queries(name)(spark, tmp.toString).collect()
        val ids = out.map(_.getLong(0)).toSet
        assert(!ids.contains(3L), s"$name emitted a row for the NULL-text doc")
        assert(ids === Set(1L, 2L, 4L), s"$name ids: $ids")
        val nGrams = out.map(r => r.getLong(r.fieldIndex("n_grams")))
        val nDup = out.map(r => r.getLong(r.fieldIndex("n_dup")))
        assert(nGrams.forall(_ > 0), s"$name n_grams: ${nGrams.mkString(",")}")
        assert(nDup.forall(_ >= 0), s"$name n_dup: ${nDup.mkString(",")}")
        // the two identical docs mark every gram duplicated; doc 4 none
        val byId = out.map(r => r.getLong(0) ->
          r.getLong(r.fieldIndex("n_dup"))).toMap
        assert(byId(1L) > 0 && byId(2L) > 0 && byId(4L) === 0, byId.toString)
      }
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  // Round-13 (ADVICE): p73/p77 must drop NULL-text docs on BOTH the Spark
  // and the oracle side — under legacy sizeOfNull, size(split(NULL)) = -1
  // would be summed into n_tok while the oracle's len(regexp_split_to_array)
  // is NULL and skipped by sum. Same bug class fixed in TermStats r12.
  test("p73/p77: NULL-text documents are excluded from mixture token counts") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-nulltext-mix")
    try {
      import spark.implicits._
      Seq(
        (1L, "one two three four", "en", "web", 18L),
        (2L, null.asInstanceOf[String], "en", "web", 0L),
        (3L, "alpha beta", "en", "book", 10L))
        .toDF("doc_id", "text", "lang", "source", "n_chars")
        .coalesce(1).write.parquet(s"$tmp/documents.parquet")
      val mix = run2("p73_source_mixture", tmp.toString)
        .collect().map(r => r.getString(0) ->
          (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_tok")))).toMap
      // the NULL-text doc contributes neither a doc nor tokens (never -1)
      assert(mix("web") === ((1L, 4L)), mix.toString)
      assert(mix("book") === ((1L, 2L)), mix.toString)
      val plan = run2("p77_epoch_mixture_plan", tmp.toString)
        .collect().map(r => r.getString(0) ->
          (r.getLong(r.fieldIndex("n_docs")), r.getLong(r.fieldIndex("n_tok")))).toMap
      assert(plan("web") === ((1L, 4L)), plan.toString)
      assert(plan("book") === ((1L, 2L)), plan.toString)
    } finally {
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(tmp).iterator().asScala.toSeq.reverse
        .foreach(java.nio.file.Files.deleteIfExists(_))
    }
  }

  private def run2(name: String, dir: String) = SparkEntry.queries(name)(spark, dir)

  test("stratified sample stage: at most k docs per stratum, deterministic") {
    val docs = Tables.load(spark, sfDir, "documents")
    val sampled = graft.pipeline.TrainingPipeline(docs)
      .sampleStratified(3, "source", "lang").result
    val sizes = sampled.groupBy(col("source"), col("lang")).count().collect()
    assert(sizes.nonEmpty && sizes.forall(_.getLong(2) <= 3))
    // deterministic: a second run selects exactly the same doc ids
    val again = graft.pipeline.TrainingPipeline(docs)
      .sampleStratified(3, "source", "lang").result
    assert(sampled.select("doc_id").exceptAll(again.select("doc_id")).count() === 0)
  }

  test("decontaminate: sub-threshold eval broadcasts via AQE; over-threshold degrades to shuffle") {
    // round-10 pin of the r8 policy change (no forced broadcast hint):
    // a production-sized benchmark suite must still BROADCAST from its
    // measured size, and an oversized eval frame must degrade to a
    // uniform shingle-keyed shuffle instead of an unbounded driver
    // collect. Either side silently flipping is a 100 TB regression.
    val docs = Tables.load(spark, sfDir, "documents")
    val eval_ = docs.filter(pmod(col("doc_id"), lit(17)) === 0)
    def shingleJoinPlan(): String = {
      val df = graft.pipeline.TrainingPipeline(docs).decontaminate(eval_).result
      df.write.format("noop").mode("overwrite").save() // AQE final plan
      df.queryExecution.executedPlan.toString
    }
    // tiny eval at this SF → AQE's measured size is under the threshold
    val broadcastPlan = shingleJoinPlan()
    assert("BroadcastHashJoin \\[__sh".r.findFirstIn(broadcastPlan).isDefined,
      s"small eval set must broadcast the shingle join:\n$broadcastPlan")
    // an over-threshold eval suite is simulated by disabling the
    // thresholds — with no hint forcing it, the join must plan shuffled
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    try {
      val shuffledPlan = shingleJoinPlan()
      assert("BroadcastHashJoin \\[__sh".r.findFirstIn(shuffledPlan).isEmpty,
        s"oversized eval must not broadcast:\n$shuffledPlan")
      assert(shuffledPlan.contains("SortMergeJoin") ||
        shuffledPlan.contains("ShuffledHashJoin"),
        s"expected a shuffled shingle join:\n$shuffledPlan")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
    }
  }

  test("p71: covered chars equal an independently computed interval union (overlaps merged, ends clamped)") {
    val G = 20; val S = 8; val P = 2147483647L
    def polyHash(s: String): Long =
      s.codePoints().toArray.foldLeft(0L)((a, c) => (a * 31 + c) % P)
    val docRows = Tables.load(spark, sfDir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val grams = docRows.toSeq.flatMap { case (id, t) =>
      (1 to math.max(1, t.length - G + 1) by S).map { i =>
        (id, i.toLong, polyHash(t.substring(i - 1, math.min(i - 1 + G, t.length))))
      }
    }
    val dupSet = grams.groupBy(_._3).filter(_._2.size > 1).keySet
    var sawMerge = false
    val expected = grams.groupBy(_._1).map { case (id, gs) =>
      val ps = gs.filter(g => dupSet(g._3)).map(_._2).sorted
      val len = docRows(id).length.toLong
      var end = 0L; var tot = 0L
      ps.foreach { i =>
        val ne = math.min(i + G - 1, len)
        if (ne > end) { tot += ne - math.max(i - 1, end); end = ne }
      }
      if (ps.nonEmpty && tot < ps.size.toLong * G) sawMerge = true
      id -> tot
    }
    val got = run("p71_dup_span_removal")
      .select("doc_id", "covered_chars", "doc_len", "cleaned_len").collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val id = r.getLong(0)
      assert(r.getLong(1) === expected(id),
        s"doc $id covered ${r.getLong(1)} != independent ${expected(id)}")
      assert(r.getLong(3) === r.getLong(2) - r.getLong(1))
      assert(r.getLong(1) >= 0 && r.getLong(1) <= r.getLong(2))
    }
    // the merge path must actually fire on this corpus or the fold is
    // only tested on disjoint spans
    assert(sawMerge, "no overlapping duplicated spans in the test corpus")
  }

  test("exact dedup: keep_id count equals distinct text count") {
    val kept = run("p05_dedup_exact").count()
    val distinctTexts = Tables.load(spark, sfDir, "documents")
      .select(col("text")).distinct().count()
    assert(kept === distinctTexts)
  }

  test("minhash estimated jaccard is within [0, 1] and pairs are ordered") {
    val df = run("p07_minhash_est_jaccard").cache()
    assert(df.filter(col("est_jaccard") < 0 || col("est_jaccard") > 1).count() === 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() === 0)
    df.unpersist()
  }

  test("minhash candidate pairs agree on >= 4/32 signature components") {
    // every LSH candidate shares a full band (4 identical components)
    val df = run("p07_minhash_est_jaccard")
    assert(df.filter(col("est_jaccard") < 4.0 / 32.0).count() === 0)
  }

  test("ngram jaccard pairs are above threshold and symmetric-free") {
    val df = run("p08_ngram_jaccard_pairs").cache()
    assert(df.filter(col("jaccard") < 0.8).count() === 0)
    assert(df.filter(col("doc_a") >= col("doc_b")).count() === 0)
    df.unpersist()
  }

  test("simhash is deterministic and 64-bit-stable across runs") {
    val a = run("p09_simhash64").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val b = run("p09_simhash64").collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(a === b)
    assert(a.size === 500)
  }

  test("ann brute-force: 5 neighbors per query, none is the query itself") {
    val df = run("p11_ann_brute_topk").cache()
    val perQuery = df.groupBy(col("query_id")).count().collect()
    assert(perQuery.forall(_.getLong(1) === 5))
    assert(df.filter(col("neighbor_id") === col("query_id")).count() === 0)
    df.unpersist()
  }

  test("ann lsh: results are a subset of brute-force candidate space") {
    val lsh = run("p12_ann_lsh_topk")
    // sanity: every (query, neighbor) pair has cosine defined — i.e. valid ids
    val ids = Tables.load(spark, sfDir, "embeddings").select(col("vec_id"))
    val bad = lsh.join(ids, lsh("neighbor_id") === ids("vec_id"), "left_anti")
    assert(bad.count() === 0)
  }

  test("dedup clusters: labels are component minima; 4 rounds reach fixpoint here") {
    val four = graft.pipeline.DedupQueries.clusterLabels(spark, sfDir, rounds = 4)
    val five = graft.pipeline.DedupQueries.clusterLabels(spark, sfDir, rounds = 5)
    // converged at the declared round count (tiny component diameters)
    assert(four.join(five.withColumnRenamed("label", "l5"), "doc_id")
      .filter(col("label") =!= col("l5")).isEmpty)
    // every label is a member of its own cluster and <= all members
    val bad = four.join(four.select(col("label").as("other_label"),
        col("doc_id").as("other_doc")), col("label") === col("other_label"))
      .filter(col("label") > col("other_doc"))
    assert(bad.isEmpty)
  }

  test("edit-distance pairs: similarity in [0,1], ordered, candidates only") {
    val df = run("p22_edit_distance_pairs").cache()
    try {
      assert(df.filter(col("edit_sim") < 0.0 || col("edit_sim") > 1.0).count() === 0)
      assert(df.filter(col("doc_a") >= col("doc_b")).count() === 0)
      // pairs must be a subset of the MinHash-LSH candidate set
      val cand = run("p06_minhash_lsh_pairs")
      assert(df.select("doc_a", "doc_b").exceptAll(cand).count() === 0)
    } finally df.unpersist()
  }

  test("ann ivf: 5 neighbors per query from the query's own cell") {
    val df = run("p21_ann_ivf_topk").cache()
    try {
      val perQuery = df.groupBy(col("query_id")).count().collect()
      assert(perQuery.nonEmpty && perQuery.forall(_.getLong(1) <= 5))
      assert(df.filter(col("neighbor_id") === col("query_id")).count() === 0)
      // every query's neighbors share one cell (nprobe=1 by construction)
      val cellsPerQuery = df.groupBy(col("query_id"))
        .agg(org.apache.spark.sql.functions.countDistinct(col("cell")).as("nc"))
        .collect()
      assert(cellsPerQuery.forall(_.getLong(1) === 1L))
    } finally df.unpersist()
  }

  test("language id: every doc classified, scores are non-negative") {
    val df = run("p03_lang_id").cache()
    assert(df.count() === 500)
    assert(df.filter(col("s_en") < 0 || col("s_es") < 0 || col("s_fr") < 0).count() === 0)
    assert(df.filter(!col("pred_lang").isin("en", "es", "fr", "und")).count() === 0)
    df.unpersist()
  }

  test("bpe merge step: single-char symbols, counts descend, top pair is argmax") {
    val rows = run("p52_bpe_merge_step").collect()
    assert(rows.length === 20)
    assert(rows.forall(r => r.getString(0).length === 1 && r.getString(1).length === 1))
    val counts = rows.map(_.getLong(2))
    assert(counts.forall(_ > 0) && counts.sameElements(counts.sortBy(-_)))
  }

  test("ann recall eval: recall in [0,1], exact arm always has k=5 rows") {
    val rows = run("p53_ann_recall_eval").collect()
    assert(rows.length === 5)
    assert(rows.forall(_.getLong(1) === 5)) // n_exact = k
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1)))
    assert(rows.forall(r => r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0))
    // the LSH arm can't beat ground truth: n_hit counts intersections only
  }

  test("cluster-safe split: no LSH candidate pair straddles train/heldout") {
    val split = run("p62_cluster_safe_split").cache()
    assert(split.count() === Tables.load(spark, sfDir, "documents").count())
    // every same-cluster pair shares a split by construction; verify the
    // stronger end-to-end property on the raw candidate pairs themselves
    val pairs = run("p06_minhash_lsh_pairs")
      .select(col("doc_a"), col("doc_b"))
    val a = split.select(col("doc_id").as("doc_a"), col("split").as("split_a"))
    val b = split.select(col("doc_id").as("doc_b"), col("split").as("split_b"))
    val crossing = pairs.join(a, "doc_a").join(b, "doc_b")
      .filter(col("split_a") =!= col("split_b"))
    assert(crossing.count() === 0)
    // both sides non-empty at this sf (80/20 by cluster-hash bucket)
    assert(split.select(col("split")).distinct().count() === 2)
    split.unpersist()
  }

  test("zipf slope: negative slope, r2 in [0,1], n_terms bounded by top-N") {
    val r = run("p61_zipf_slope").collect().head
    assert(r.getLong(0) > 0 && r.getLong(0) <= 1000)
    assert(r.getDouble(1) < 0.0) // frequency falls with rank
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
  }

  // Round-15 (r14 verdict task 6): the full BPE training loop. Merge
  // determinism is the whole point of shipping a merge table — two runs
  // must agree bit-for-bit (argmax ties break lexicographically, the
  // rewrite is a fixed left-to-right scan), and round 1 must equal the
  // single-step p52 argmax (the loop IS the step, iterated).
  test("bpeTrain is deterministic and its first merge is p52's argmax") {
    val a = graft.pipeline.TrainingPipeline.bpeTrain(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    val b = graft.pipeline.TrainingPipeline.bpeTrain(spark, sfDir)
      .collect().map(_.toSeq).toSeq
    assert(a === b)
    assert(a.size === graft.pipeline.TrainingPipeline.BpeMerges)
    // ranks are 1..n and pair counts never increase as merges consume mass
    assert(a.map(_.head) === (1 to a.size).map(_.toLong))
    val p52Top = run("p52_bpe_merge_step").collect().head
    val first = a.head
    assert(first(1) === p52Top.getString(0) && first(2) === p52Top.getString(1),
      s"round-1 merge ${first(1)}+${first(2)} != p52 argmax " +
        s"${p52Top.getString(0)}+${p52Top.getString(1)}")
    // merged symbol is the concatenation, by construction
    assert(a.forall(r => r(3) === s"${r(1)}${r(2)}"))
  }

  test("bpeTrainToVocab: merge budget = target minus base alphabet") {
    val tp = graft.pipeline.TrainingPipeline
    // base alphabet of the fixture corpus (distinct chars in the vocab)
    val base = spark.read.parquet(s"$sfDir/documents.parquet")
      .selectExpr("explode(split(lower(trim(text)), '\\\\s+')) AS term")
      .where("length(term) >= 2")
      .selectExpr("explode(split(term, '')) AS ch")
      .agg(org.apache.spark.sql.functions.countDistinct("ch"))
      .head().getLong(0)
    // target = base + 3 symbols → exactly 3 merges (corpus has plenty)
    val m3 = tp.bpeTrainToVocab(spark, sfDir, (base + 3).toInt).collect()
    assert(m3.length === 3)
    // the derived budget trains the SAME merges as the explicit count
    val e3 = tp.bpeTrain(spark, sfDir, 3).collect()
    assert(m3.map(_.toSeq).toSeq === e3.map(_.toSeq).toSeq)
    // a target at or below the base alphabet trains zero merges
    assert(tp.bpeTrainToVocab(spark, sfDir, base.toInt).count() === 0L)
  }

  test("bpeEncode: every word yields >= 1 token, merges only shrink counts") {
    val enc = run("p79_bpe_encode").collect()
    assert(enc.nonEmpty)
    // a word is at least one token after any number of merges
    enc.foreach(r => assert(r.getLong(1) >= r.getLong(2),
      s"source ${r.getString(0)}: ${r.getLong(1)} tokens < ${r.getLong(2)} words"))
    // six merges strictly compress this corpus vs character tokens
    val charTotal = graft.Tables.load(spark, sfDir, "documents")
      .selectExpr("sum(aggregate(transform(split(lower(trim(text)), '\\\\s+'), t -> length(t)), 0L, (a, x) -> a + x)) AS c")
      .collect().head.getLong(0)
    val tokTotal = enc.map(_.getLong(1)).sum
    assert(tokTotal < charTotal, s"BPE tokens $tokTotal !< chars $charTotal")
  }

  test("token count matches manual whitespace split on a sample") {
    val sample = Tables.load(spark, sfDir, "documents")
      .select(col("doc_id"), col("text")).limit(20).collect()
    val got = run("p01_token_count")
      .select(col("doc_id"), col("n_tokens")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    sample.foreach { r =>
      val expected = r.getString(1).trim.split("\\s+").length.toLong
      assert(got(r.getLong(0)) === expected, s"doc ${r.getLong(0)}")
    }
  }
}
