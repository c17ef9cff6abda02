package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants of the round-5 curation operators (the driver oracle
  * pins cross-engine equality; these pin the properties that make the
  * results CORRECT, not just reproducible). */
class CurationExtrasSpec extends AnyFunSuite {

  private lazy val spark = SparkTestSession.spark
  private val dir = SparkTestSession.sfDir

  private def q(name: String) =
    SparkEntry.queries(name)(spark, dir)

  test("p31: redacted text contains no matchable email or bare IPv4") {
    val rows = q("p31_pii_redact").collect()
    assert(rows.nonEmpty)
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}".r
    rows.foreach { r =>
      val red = r.getAs[String]("redacted")
      assert(email.findFirstIn(red).isEmpty, s"doc ${r.getLong(0)} leaks an email")
      assert(red.contains("<EMAIL>") || red.contains("<IP>"))
    }
  }

  test("p32: every surviving sentence is globally unique, firsts kept") {
    val out = q("p32_sentence_dedup")
    // re-split the deduped texts: a sentence may appear at most once corpus-wide
    val resplit = out
      .select(col("doc_id"), explode(split(col("text_dedup"), "\\.\\s+")).as("sent"))
      .filter(length(trim(col("sent"))) > 0)
    val dupes = resplit.groupBy("sent").count().filter(col("count") > 1).count()
    assert(dupes === 0L)
    // doc 0 keeps all its sentences that appear nowhere earlier — its own
    // first sentence must survive (nothing precedes (0, 1))
    val d0 = out.filter(col("doc_id") === 0).collect()
    assert(d0.nonEmpty && d0.head.getAs[Long]("n_kept") >= 1L)
  }

  test("p33: packing is gap-free and budget-aligned within each shard") {
    val rows = q("p33_sequence_packing").collect()
    val byShard = rows.groupBy(_.getAs[Long]("shard_id"))
    byShard.foreach { case (_, rs) =>
      val sorted = rs.sortBy(_.getAs[Long]("cum_tok"))
      // running sum is gap-free: each cum = previous cum + own n_tok
      sorted.foldLeft(0L) { (prev, r) =>
        assert(r.getAs[Long]("cum_tok") === prev + r.getAs[Long]("n_tok"))
        r.getAs[Long]("cum_tok")
      }
      rs.foreach { r =>
        val before = r.getAs[Long]("cum_tok") - r.getAs[Long]("n_tok")
        assert(r.getAs[Long]("pack_id") === before / 2048)
        assert(r.getAs[Long]("pack_offset") === before % 2048)
      }
    }
  }

  test("p35: keep is exactly reason == ok, and every reason is a known code") {
    val rows = q("p35_quality_gate").collect()
    assert(rows.nonEmpty)
    val codes = Set("ok", "too_short", "word_length", "symbolic", "repetitive")
    rows.foreach { r =>
      val reason = r.getAs[String]("reason")
      assert(codes.contains(reason), s"unknown reason $reason")
      assert(r.getAs[Boolean]("keep") === (reason == "ok"))
      if (r.getAs[Long]("n_toks") < 20) assert(reason === "too_short")
    }
  }

  test("p36: every query probes at most 2 cells and returns a full top-5") {
    val rows = q("p36_ann_ivf_nprobe2").collect()
    rows.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rs) =>
      assert(rs.length === 5)
      assert(rs.map(_.getAs[Long]("cell")).distinct.length <= 2)
      assert(rs.map(_.getAs[Int]("rk")).sorted.toSeq === Seq(1, 2, 3, 4, 5))
    }
  }

  test("p37: flags only new-snapshot docs, attributes only corpus docs") {
    val rows = q("p37_incremental_dedup").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("new_doc_id") % 10 === 7L)
      assert(r.getAs[Long]("match_min") % 10 !== 7L)
      val hits = r.getAs[Long]("n_hit_bands")
      assert(hits >= 1L && hits <= graft.pipeline.PortableHash.Bands.toLong)
    }
  }

  test("p37: broadcasts under the threshold, degrades to shuffle above it") {
    // the snapshot side carries no broadcast hint — the join strategy must
    // follow spark.sql.autoBroadcastJoinThreshold so a large refresh can't
    // OOM the driver the way a forced broadcast() would
    def executedPlan(): String = {
      val df = q("p37_incremental_dedup")
      df.collect() // finalize AQE so the runtime join choice is visible
      df.asInstanceOf[org.apache.spark.sql.classic.Dataset[org.apache.spark.sql.Row]]
        .queryExecution.executedPlan.toString
    }
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
      assert(executedPlan().contains("BroadcastHashJoin"),
        "small snapshot side should broadcast under the default threshold")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val shuffled = executedPlan()
      assert(!shuffled.contains("BroadcastHashJoin"),
        s"join must degrade to a shuffle when broadcast is off:\n$shuffled")
      assert(shuffled.contains("SortMergeJoin") || shuffled.contains("ShuffledHashJoin"))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("p38: partitions the corpus, and a Lloyd step never raises inertia") {
    import graft.pipeline.Clustering
    val rows = q("p38_kmeans_quantized").collect()
    assert(rows.length <= 8)
    val corpus = spark.read.parquet(s"$dir/embeddings.parquet").count()
    assert(rows.map(_.getAs[Long]("n_members")).sum === corpus)
    rows.foreach(r => assert(r.getAs[Long]("inertia") >= 0L))
    // Lloyd monotonicity on the quantized objective: inertia after the
    // centroid update (measured against the NEW centroids) is <= the
    // first assignment's inertia
    val qz = Clustering.quantized(spark, dir)
    val c0 = Clustering.seedInit(qz, 8)
    val a1 = Clustering.assign(qz, c0)
    val i1 = a1.agg(sum("dist")).collect().head.getLong(0)
    val i2 = rows.map(_.getAs[Long]("inertia")).sum
    assert(i2 <= i1, s"inertia rose after a Lloyd step: $i1 -> $i2")
  }

  test("p39: canonical URLs have no fragments/tracking params, firsts unique") {
    val rows = q("p39_url_canonical").collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val canon = r.getAs[String]("canon")
      assert(!canon.contains("#"))
      assert(!canon.contains("utm_") && !canon.contains("fbclid"))
      assert(!canon.contains(":443") && !canon.contains(":80"))
      assert(r.getAs[String]("host") === r.getAs[String]("host").toLowerCase)
      // real params survive the tracking filter
      if (r.getAs[String]("url").contains("a=1")) assert(canon.contains("a=1"))
    }
    // exactly one is_first per canonical URL
    val firsts = rows.filter(_.getAs[Boolean]("is_first"))
      .map(_.getAs[String]("canon"))
    assert(firsts.length === rows.map(_.getAs[String]("canon")).distinct.length)
    assert(firsts.distinct.length === firsts.length)
  }

  test("p34: quantized values bounded by ±127 and scale positive") {
    val rows = q("p34_embedding_quantize").collect()
    assert(rows.length > 0)
    rows.foreach { r =>
      assert(r.getAs[Double]("scale") > 0.0)
      assert(r.getAs[Long]("q_min") >= -127L)
      // floor(x·scale + .5) can reach exactly 127 at the max-|x| element
      assert(r.getAs[Long]("q_max") <= 127L)
      assert(r.getAs[Long]("q_l1") >= math.abs(r.getAs[Long]("q_sum")))
    }
  }
}
