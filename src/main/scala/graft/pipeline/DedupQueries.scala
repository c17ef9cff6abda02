package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Deduplication operators for training-data pipelines (SURVEY north-star
  * extensions): exact, MinHash+LSH, SimHash, n-gram Jaccard, embedding-cosine
  * near-dup.
  *
  * Scale design (the point at 100 TB):
  *  - Exact dedup = hash-groupBy → one shuffle on a 128-bit digest, perfectly
  *    parallel, no skew (hash keys are uniform).
  *  - MinHash: signatures are computed scan-side with codegen'd higher-order
  *    functions (no UDF, no shuffle); candidate pairs come from a *band
  *    equi-join* (shuffle on (band, signature) — the canonical LSH join),
  *    never a cross join.
  *  - SimHash / Jaccard verify run only on blocked/banded candidates.
  *  - All "randomness" is compile-time constants from a fixed seed, so every
  *    run (and every executor) agrees.
  */
object DedupQueries {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Exact duplicate grouping on a content digest. */
  private def exact(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keep_id"), count(lit(1)).as("n_copies"))
      .orderBy(col("keep_id"))

  private val exactSql =
    """SELECT md5(text) AS content_md5, min(doc_id) AS keep_id, count(*) AS n_copies
      |FROM documents GROUP BY md5(text) ORDER BY keep_id""".stripMargin

  // ---------------------------------------------------------------- MinHash
  private val MinhashPerms = 32
  private val Bands = 8 // 8 bands × 4 rows
  private val RowsPerBand = MinhashPerms / Bands
  private val P = 2147483647L // 2^31 - 1 (Mersenne prime)
  /** Fixed-seed affine permutations (a, b); a*h+b stays < 2^62 (no overflow). */
  private val perms: Seq[(Long, Long)] = {
    val rnd = new Random(42)
    Seq.fill(MinhashPerms)((rnd.nextInt(Int.MaxValue - 1).toLong + 1L,
      rnd.nextInt(Int.MaxValue).toLong))
  }

  /** 3-word shingle hashes per document (the discriminative unit — unigram
    * tokens from a small vocabulary would make every pair look similar).
    * Hashes are combined numerically from per-token hashes — building the
    * shingle *strings* just to hash them costs ~5× more (measured). */
  private[graft] def shingleHashes(d: DataFrame): DataFrame =
    d.withColumn("tokens", split(trim(col("text")), "\\s+"))
      .withColumn("th", expr(s"transform(tokens, t -> pmod(xxhash64(t), ${P}L))"))
      // reduced mod P before combining: (P·31+P)·31+P < 2^41, no ANSI overflow
      .withColumn("sh", expr(
        s"""transform(sequence(0, greatest(size(th) - 3, 0)),
           | i -> pmod((element_at(th, i + 1) * 31L + element_at(th, i + 2)) * 31L
           |           + element_at(th, i + 3), ${P}L))""".stripMargin))

  /** doc_id + 32-component minhash signature array, computed in ONE pass
    * over the shingle hashes by the native MinHashSignature expression.
    * Entirely narrow (scan-side) work. */
  private[pipeline] def signatures(d: DataFrame): DataFrame =
    shingleHashes(d)
      .select(col("doc_id"),
        graft.functions.minhash_sig(col("sh"), perms.map(_._1), perms.map(_._2), P)
          .as("sig"))

  /** LSH band rows: (doc_id, band, band_sig) — the join key for candidates. */
  private[pipeline] def bandRows(sig: DataFrame): DataFrame = {
    val bandStructs = (0 until Bands).map { bnd =>
      val sliceStr = expr(
        s"concat_ws(',', transform(slice(sig, ${bnd * RowsPerBand + 1}, $RowsPerBand), x -> cast(x as string)))")
      struct(lit(bnd).as("band"), xxhash64(sliceStr).as("band_sig"))
    }
    sig.select(col("doc_id"), explode(array(bandStructs: _*)).as("b"))
      .select(col("doc_id"), col("b.band").as("band"), col("b.band_sig").as("band_sig"))
  }

  /** Signature stage is persisted: the 32-permutation × shingle transform is
    * the expensive narrow stage, and both the band join and the verify join
    * consume it multiple times — caching avoids recomputing it per branch
    * (at cluster scale this is a materialized intermediate, exactly like a
    * staged pipeline would checkpoint it). */
  private def cachedSignatures(s: SparkSession, dir: String): DataFrame = {
    val sig = signatures(docs(s, dir))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    sig
  }

  /** MinHash-LSH candidate duplicate pairs via band equi-join (a < b). */
  private def minhashPairs(s: SparkSession, dir: String): DataFrame = {
    val bands = bandRows(cachedSignatures(s, dir))
    val a = bands.select(col("band").as("band_a"), col("band_sig").as("sig_a"),
      col("doc_id").as("doc_a"))
    val b = bands.select(col("band").as("band_b"), col("band_sig").as("sig_b"),
      col("doc_id").as("doc_b"))
    a.join(b, col("band_a") === col("band_b") && col("sig_a") === col("sig_b")
        && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"))
      .distinct()
      .orderBy(col("doc_a"), col("doc_b"))
  }

  /** MinHash-estimated Jaccard for every candidate pair (fraction of the 32
    * signature components that agree). */
  private def minhashJaccard(s: SparkSession, dir: String): DataFrame = {
    val sig = cachedSignatures(s, dir)
    val asArr = sig
    val bands = bandRows(sig)
    val a = bands.select(col("band").as("band_a"), col("band_sig").as("sig_a"),
      col("doc_id").as("doc_a"))
    val b = bands.select(col("band").as("band_b"), col("band_sig").as("sig_b"),
      col("doc_id").as("doc_b"))
    val cand = a.join(b, col("band_a") === col("band_b") && col("sig_a") === col("sig_b")
        && col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b")).distinct()
    cand
      .join(asArr.withColumnRenamed("doc_id", "doc_a").withColumnRenamed("sig", "sa"), "doc_a")
      .join(asArr.withColumnRenamed("doc_id", "doc_b").withColumnRenamed("sig", "sb"), "doc_b")
      .withColumn("est_jaccard",
        expr(s"aggregate(zip_with(sa, sb, (x, y) -> IF(x = y, 1, 0)), 0, (acc, v) -> acc + v) / cast($MinhashPerms as double)"))
      .select(col("doc_a"), col("doc_b"), col("est_jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------------------- n-gram Jaccard
  /** Exact token-set Jaccard as a token equi-join (the scalable
    * set-similarity join): explode distinct tokens, join on (source, token),
    * count common tokens per pair, then |A∪B| = |A|+|B|−common. Pairs with
    * no shared token never materialize, and the shuffle key is the token —
    * no quadratic per-pair array work, unlike a blocked self-join. Source
    * blocking bounds the candidate space (at full scale the block key would
    * be an LSH band instead). */
  private def ngramJaccard(s: SparkSession, dir: String): DataFrame = {
    // persisted: both sides of the self-join consume the same gram arrays
    val d = shingleHashes(docs(s, dir))
      .withColumn("grams", array_distinct(col("sh")))
      .select(col("doc_id"), col("source"),
        col("grams"), size(col("grams")).as("nt"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val toks = d.select(col("doc_id"), col("source"), col("nt"),
      explode(col("grams")).as("tok"))
    val a = toks.select(col("source").as("src"), col("tok"),
      col("doc_id").as("doc_a"), col("nt").as("nt_a"))
    val b = toks.select(col("source").as("src"), col("tok"),
      col("doc_id").as("doc_b"), col("nt").as("nt_b"))
    a.join(b, Seq("src", "tok"))
      .filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("nt_a"), col("nt_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double")
        / (col("nt_a") + col("nt_b") - col("common")).cast("double"))
      .filter(col("jaccard") >= 0.8)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // --------------------------------------------------------------- SimHash
  /** 64-bit SimHash per document + 16-bit prefix bucket (hamming-neighbor
    * candidates share buckets). The bit-vote kernel is a native codegen'd
    * Catalyst expression (graft.functions.SimHash64) over token hashes. */
  private def simhash(s: SparkSession, dir: String): DataFrame =
    docs(s, dir)
      .withColumn("th", expr("transform(split(trim(text), '\\\\s+'), t -> xxhash64(t))"))
      .withColumn("simhash64", graft.functions.simhash64(col("th")))
      .select(col("doc_id"), col("simhash64"),
        expr("simhash64 >> 48").as("bucket16"))
      .orderBy(col("doc_id"))

  // --------------------------------------------- embedding cosine near-dup
  /** Near-duplicate pairs by embedding cosine over LSH-bucketed candidates
    * (random-hyperplane signatures, fixed seed). */
  private def embeddingNearDup(s: SparkSession, dir: String): DataFrame = {
    val emb = Tables.load(s, dir, "embeddings")
    val bucketed = Similarity.withLshBucket(emb, Similarity.planes(8, 64, seed = 7))
    val a = bucketed.select(col("bucket").as("bk_a"), col("vec_id").as("vec_a"),
      col("embedding").as("va"))
    val b = bucketed.select(col("bucket").as("bk_b"), col("vec_id").as("vec_b"),
      col("embedding").as("vb"))
    a.join(b, col("bk_a") === col("bk_b") && col("vec_a") < col("vec_b"))
      .withColumn("cosine", graft.functions.vec_cosine(col("va"), col("vb")))
      // the synthetic embeddings are near-random (max pairwise cosine ≈ 0.48)
      // — 0.2 sits at ~p99 of the pair distribution, so "near-dup" is
      // meaningful while the candidate set stays small.
      .filter(col("cosine") >= 0.2)
      .select(col("vec_a"), col("vec_b"), col("cosine"))
      .orderBy(col("vec_a"), col("vec_b"))
  }

  val all: Seq[Q] = Seq(
    Q("p05_dedup_exact", exact, Some(exactSql)),
    Q("p06_minhash_lsh_pairs", minhashPairs, None),
    Q("p07_minhash_est_jaccard", minhashJaccard, None),
    Q("p08_ngram_jaccard_pairs", ngramJaccard, None),
    Q("p09_simhash64", simhash, None),
    Q("p10_embedding_neardup", embeddingNearDup, None))

  /** Debug/inspection helper: full shingle-jaccard distribution (no
    * threshold) over source-blocked pairs. */
  private[graft] def shingleJaccardAll(s: SparkSession, dir: String): DataFrame = {
    val d = shingleHashes(docs(s, dir))
      .withColumn("grams", array_distinct(col("sh")))
      .select(col("doc_id"), col("source"), col("grams"), size(col("grams")).as("nt"))
    val toks = d.select(col("doc_id"), col("source"), col("nt"), explode(col("grams")).as("tok"))
    val a = toks.select(col("source").as("src"), col("tok"), col("doc_id").as("doc_a"), col("nt").as("nt_a"))
    val b = toks.select(col("source").as("src"), col("tok"), col("doc_id").as("doc_b"), col("nt").as("nt_b"))
    a.join(b, Seq("src", "tok")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"), col("nt_a"), col("nt_b"))
      .agg(count(lit(1)).as("common"))
      .withColumn("jaccard", col("common").cast("double")
        / (col("nt_a") + col("nt_b") - col("common")).cast("double"))
  }
}
