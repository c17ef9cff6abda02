package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** SemanticOps invariants the DuckDB oracle can't express: ordering and
  * containment properties of the SemDeDup drop set, Bloom-filter soundness
  * (no false NEGATIVES by construction), OOV bounds, and the plan shapes
  * the 100 TB story depends on. */
class SemanticOpsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def run(name: String) =
    SparkEntry.queries(name)(spark, sfDir)

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
      .queryExecution.executedPlan.toString

  test("p49: every dropped vector cites a smaller same-cell representative") {
    val rows = run("p49_semdedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) < r.getLong(0),
        s"dup_of ${r.getLong(1)} must be < vec_id ${r.getLong(0)}")
    }
    // the representative itself must never appear as dropped (it has no
    // smaller near-dup by the greedy min rule... unless it was dropped by
    // an even smaller one — transitively the MINIMUM of each chain stays)
    val dropped = rows.map(_.getLong(0)).toSet
    val minDupOf = rows.map(_.getLong(1)).min
    assert(!dropped.contains(minDupOf))
  }

  test("p50: Bloom prefilter is sound (exact hits always pass the filter)") {
    val rows = run("p50_bloom_decontam").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nSh, nMaybe, nExact, nFp) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      assert(nExact <= nMaybe, "a true member can never miss the filter")
      assert(nMaybe <= nSh)
      assert(nFp == nMaybe - nExact && nFp >= 0)
    }
  }

  test("p50: the bitset (the bounded side) broadcasts; exact verify joins survivors only") {
    // the k·m-bounded bit positions broadcast; the raw eval shingle set is
    // a corpus fraction and deliberately does NOT carry a broadcast hint
    // (r8) — only the Bloom survivors reach that join
    val plan = planOf(run("p50_bloom_decontam"))
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join for the Bloom bitset:\n$plan")
  }

  test("p51: OOV rate is a proper fraction, some units fall outside the cut") {
    val df = run("p51_oov_rate")
    val rows = df.collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      val rate = r.getDouble(3)
      assert(rate >= 0.0 && rate <= 1.0)
      assert(r.getLong(2) <= r.getLong(1))
    }
    val plan = planOf(df)
    assert(plan.contains("BroadcastHashJoin"),
      s"expected the top-K vocab broadcast:\n$plan")
    // some tokens must actually fall outside the top-K cut for the signal
    // to be non-trivial on this corpus
    assert(rows.exists(_.getLong(2) > 0))
  }

  test("p49: no cartesian product — the pair join is keyed by cell") {
    val plan = planOf(run("p49_semdedup"))
    assert(!plan.contains("CartesianProduct"),
      s"pair search must stay inside cells:\n$plan")
  }

  test("p49: fused cell generator equals the explicit pair-join form") {
    // reference implementation = the pre-r8 a×b self-join + min-aggregate,
    // rebuilt inline from the same stages; the fused CellNearDupPairs
    // generator must produce the identical dup set
    import graft.pipeline.Clustering
    val q = Clustering.quantized(spark, sfDir)
    val kk = q.agg(greatest(lit(64L),
      expr("CAST(ceil(sqrt(count(1))) AS BIGINT)"))).head().getLong(0)
    val cents0 = Clustering.seedInit(q, kk.toInt)
    val a2 = Clustering.assign(q, Clustering.update(Clustering.assign(q, cents0)))
    val m = a2.withColumn("n",
      graft.functions.vec_dot(col("q"), col("q")).cast("long"))
      .select(col("cell"), col("vec_id"), col("q"), col("n"))
    val a = m.select(col("cell"), col("vec_id").as("a_id"),
      col("q").as("qa"), col("n").as("na"))
    val b = m.select(col("cell"), col("vec_id").as("b_id"),
      col("q").as("qb"), col("n").as("nb"))
    val joinForm = a.join(b, Seq("cell")).filter(col("a_id") < col("b_id"))
      .withColumn("dot",
        graft.functions.vec_dot(col("qa"), col("qb")).cast("long"))
      .filter(col("dot") > 0 &&
        col("dot") * col("dot") * lit(10000L) >= lit(1600L) * col("na") * col("nb"))
      .groupBy(col("b_id"), col("cell"))
      .agg(min(col("a_id")).as("dup_of"))
      .select(col("b_id").as("vec_id"), col("dup_of"), col("cell"))
    val fused = run("p49_semdedup")
    assert(fused.count() > 0)
    assert(fused.exceptAll(joinForm).count() === 0)
    assert(joinForm.exceptAll(fused).count() === 0)
  }

  test("p50: m derived from the eval-set size cuts false positives vs the old fixed 2^16") {
    // eval: 30k distinct shingles (doc 0 ≡ 0 mod 17) — enough to saturate
    // a fixed m = 2^16 filter; corpus: 2k shingles from a far id range.
    // Shingles live in [0, P) like real PortableHash output (a·shingle
    // must not overflow a long under ANSI mode) and are scrambled with a
    // NONLINEAR hash — any linear i·K map composes with the filter's own
    // linear probes into a lattice mod the pow2 m and never fills it.
    // xxhash64 is seed-fixed, so the test is deterministic.
    def shingle = pmod(xxhash64(col("id")), lit(pipeline.PortableHash.P))
    val evalPairs = spark.range(30000)
      .select(lit(0L).as("doc_id"), shingle.as("shingle"))
    val corpusPairs = spark.range(100000, 102000)
      .select(lit(1L).as("doc_id"), shingle.as("shingle"))
    val pairs = evalPairs.unionAll(corpusPairs)
    def stats(df: org.apache.spark.sql.DataFrame): (Long, Long) = {
      val r = df.agg(coalesce(sum("n_false_pos"), lit(0L)),
        coalesce(sum("n_exact"), lit(0L))).collect()(0)
      (r.getLong(0), r.getLong(1))
    }
    val (fpFixed, exFixed) = stats(pipeline.SemanticOps.bloomCore(pairs, Some(65536L)))
    val (fpDerived, exDerived) = stats(pipeline.SemanticOps.bloomCore(pairs, None))
    // exact verification is independent of the filter width
    assert(exFixed === exDerived)
    // the fixed filter is measurably undersized at this eval size: each
    // j-subspace fills to 1−e^{−30000/65536} ≈ 37% → FP ≈ 0.37³ ≈ 5% of
    // the 2000 corpus shingles (observed 87)...
    assert(fpFixed > 50L, s"expected a saturated fixed filter, got $fpFixed FPs")
    // ...and the derived m (2^20 here: ceil(28.47·30000) rounded up to a
    // pow2) collapses the FP count by orders of magnitude
    assert(fpDerived * 20 < fpFixed,
      s"derived sizing should cut FPs ≫ 20×: derived=$fpDerived fixed=$fpFixed")
  }

  test("bloom m-derivation: pow2 ladder clamps at the 2^31 probe domain and overflows LOUDLY") {
    def mFor(nev: Long): Long = spark.range(1)
      .select(expr(pipeline.SemanticOps.mDerivationSql(nev.toString)).as("m"))
      .head().getLong(0)
    // nominal sizing: ~28.47·n rounded up to a power of two
    assert(mFor(30000L) === (1L << 20))
    // the largest demand the (h mod P) mod m probe domain can honor is
    // m = 2^31 (P = 2^31−1): just-under-the-ceiling demand still resolves
    assert(mFor(75000000L) === (1L << 31)) // 28.47·75e6 ≈ 2.13e9 ≤ 2^31
    // beyond it the old ladder emitted a null m that cascaded into
    // silently-empty results; now it must raise with a diagnosable message
    val e = intercept[Throwable] { mFor(100000000L) }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bloom m-derivation overflow")),
      s"expected the loud overflow guard, got: $e")
    // the DuckDB oracle must fail the same way past its ladder (round-11
    // advice: loud-vs-loud, never loud-vs-silent-null) — pin the error()
    // guard into the oracle text; local_check exercises the happy path
    val oracle = SparkEntry.oracleSql("p50_bloom_decontam")
    assert(oracle.contains("error(") &&
      oracle.contains("bloom m-derivation overflow"),
      "oracle msel CTE lost its loud overflow mirror")
  }
}
