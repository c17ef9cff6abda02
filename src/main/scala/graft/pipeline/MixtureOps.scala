package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus selection & mixing statistics — the operators that decide HOW MUCH
  * of each slice of a curated corpus a training run actually samples:
  *
  *  - **p72 DSIR importance weights** (Xie et al., "Data Selection for
  *    Language Models via Importance Resampling", NeurIPS 2023): hashed
  *    n-gram bucket counts under a target-vs-raw bag-of-ngrams model give
  *    every raw document a log importance weight
  *    `Σ_b c_doc[b]·(ln p̂_target[b] − ln p̂_raw[b])` with Laplace-smoothed
  *    bucket probabilities. The held-out target slice reuses the corpus
  *    convention of p25/p47 (doc_id % 17 = 0 stands in for the curated
  *    target domain).
  *  - **p73 source mixture reweighting**: temperature-smoothed sampling
  *    weights per source, `q_s ∝ p_s^α` with α = 1/2 (the exponential
  *    smoothing of multilingual/multi-domain training à la XLM-R) — emits
  *    natural share, smoothed share, and the sampling boost q/p each
  *    source gets.
  *  - **p74 eval-side leak rate**: per EVAL document, the fraction of its
  *    3-token shingles that occur anywhere in the training split — the
  *    per-example contamination statistic model reports publish (the
  *    train-side flags are p25; the train→eval attribution is p47; this is
  *    the eval-side view that decides whether a benchmark number is
  *    trustworthy).
  *
  * 100 TB shapes: every aggregate is keyed by a bounded domain (8192 hash
  * buckets, the source catalog) or a uniform high-cardinality key
  * ((doc_id, bucket), shingle hash) with map-side partial collapse; the
  * only joins against corpus-scale frames broadcast a bounded side (the
  * 8192-row log-ratio table; the eval shingle set). Nothing windows,
  * nothing funnels through one task.
  */
object MixtureOps {

  private val PH = graft.pipeline.PortableHash

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  // ------------------------------------------- p72 DSIR importance weights
  /** Hash-bucket count B: DSIR's paper setting is 10k; a power of two
    * keeps the modulus cheap in both engines. */
  private val Buckets = 8192L

  /** Per-doc hashed n-gram feature buckets (unigrams + bigrams over the
    * shared token-hash arrays): the fixed-dimension bag-of-ngrams both
    * distributions are estimated on. */
  private def featureStream(s: SparkSession, dir: String): DataFrame = {
    val B = Buckets
    val P = PH.P
    CorpusOps.tokenHashed(s, dir)
      .select(col("doc_id"),
        explode(expr(
          s"""concat(
             |  transform(th, h -> pmod(h, ${B}L)),
             |  CASE WHEN size(th) >= 2
             |    THEN transform(sequence(1, size(th) - 1),
             |      i -> pmod(pmod(element_at(th, i) * 31L
             |                     + element_at(th, i + 1), ${P}L), ${B}L))
             |    ELSE CAST(array() AS ARRAY<BIGINT>) END)""".stripMargin))
          .as("b"))
  }

  /** DSIR log importance weight per RAW document. One corpus pass builds
    * the (doc_id, bucket) counts; bucket-marginal counts for both splits
    * collapse map-side onto the ≤8192-bucket domain; the log-ratio table
    * (≤8192 rows) broadcasts back onto the per-doc counts. */
  private def dsirWeights(s: SparkSession, dir: String): DataFrame = {
    val B = Buckets
    val feats = featureStream(s, dir)
    // per-raw-doc bucket counts: the frame the weights are scored over
    val rawDoc = feats.filter(pmod(col("doc_id"), lit(17)) =!= 0)
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    // bucket marginals; raw derives from rawDoc (no second corpus scan)
    val tgt = feats.filter(pmod(col("doc_id"), lit(17)) === 0)
      .groupBy(col("b")).agg(count(lit(1)).as("ct"))
    val rawB = rawDoc.groupBy(col("b")).agg(sum(col("c")).as("cr"))
    val tTot = tgt.agg(sum(col("ct")).as("t_tot"))
    val rTot = rawB.agg(sum(col("cr")).as("r_tot"))
    val lr = rawB.join(tgt, Seq("b"), "left")
      .crossJoin(tTot).crossJoin(rTot) // two one-row aggregates
      .select(col("b"),
        (log((coalesce(col("ct"), lit(0L)) + lit(1L)).cast("double") /
             (col("t_tot") + lit(B)).cast("double"))
          - log((col("cr") + lit(1L)).cast("double") /
                (col("r_tot") + lit(B)).cast("double"))).as("logratio"))
    rawDoc.join(broadcast(lr), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_feats"),
        sum(col("c").cast("double") * col("logratio")).as("logw"))
      .select(col("doc_id"), col("n_feats"), col("logw"),
        (col("logw") / col("n_feats").cast("double")).as("mean_logw"))
      .orderBy(col("doc_id"))
  }

  private val dsirSql = {
    val B = Buckets
    val P = PH.P
    s"""WITH th AS (SELECT doc_id, ${PH.duckTokenHashes("text")} AS th FROM documents),
       |feats AS (
       |  SELECT doc_id, unnest(list_concat(
       |    list_transform(th, h -> h % $B),
       |    CASE WHEN len(th) >= 2
       |      THEN list_transform(range(1, len(th)),
       |        i -> ((th[i] * 31 + th[i + 1]) % $P) % $B)
       |      ELSE [] END)) AS b
       |  FROM th),
       |raw_doc AS (
       |  SELECT doc_id, b, count(*) AS c FROM feats
       |  WHERE doc_id % 17 <> 0 GROUP BY doc_id, b),
       |tgt AS (SELECT b, count(*) AS ct FROM feats WHERE doc_id % 17 = 0 GROUP BY b),
       |raw_b AS (SELECT b, CAST(sum(c) AS BIGINT) AS cr FROM raw_doc GROUP BY b),
       |t_tot AS (SELECT CAST(sum(ct) AS BIGINT) AS t_tot FROM tgt),
       |r_tot AS (SELECT CAST(sum(cr) AS BIGINT) AS r_tot FROM raw_b),
       |lr AS (
       |  SELECT raw_b.b,
       |    ln(CAST(coalesce(tgt.ct, 0) + 1 AS DOUBLE) / CAST(t_tot + $B AS DOUBLE))
       |      - ln(CAST(cr + 1 AS DOUBLE) / CAST(r_tot + $B AS DOUBLE)) AS logratio
       |  FROM raw_b LEFT JOIN tgt USING (b) CROSS JOIN t_tot CROSS JOIN r_tot)
       |SELECT doc_id,
       |  CAST(sum(c) AS BIGINT) AS n_feats,
       |  sum(CAST(c AS DOUBLE) * logratio) AS logw,
       |  sum(CAST(c AS DOUBLE) * logratio) / CAST(sum(c) AS DOUBLE) AS mean_logw
       |FROM raw_doc JOIN lr USING (b)
       |GROUP BY doc_id ORDER BY doc_id""".stripMargin
  }

  // ------------------------------------------ p73 source mixture reweight
  /** Temperature-smoothed source sampling weights, α = 1/2: q_s =
    * √p_s / Σ √p, where p_s is the source's natural token share. sqrt is
    * IEEE-correctly-rounded, so both engines agree bit-for-bit; the
    * source catalog is tiny at any corpus size (the only all-reduce is
    * over the per-source aggregate). */
  private def sourceMixture(s: SparkSession, dir: String): DataFrame = {
    val perSrc = docs(s, dir)
      .select(col("source"),
        size(split(trim(col("text")), "\\s+")).cast("long").as("tk"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tk")).as("n_tok"))
    val tot = perSrc.agg(sum(col("n_tok")).cast("double").as("n_all"))
    val z = perSrc.crossJoin(tot)
      .withColumn("p_nat", col("n_tok").cast("double") / col("n_all"))
    val sz = z.agg(sum(sqrt(col("p_nat"))).as("sum_sqrt"))
    z.crossJoin(sz)
      .select(col("source"), col("n_docs"), col("n_tok"), col("p_nat"),
        (sqrt(col("p_nat")) / col("sum_sqrt")).as("q_smooth"))
      .withColumn("boost", col("q_smooth") / col("p_nat"))
      .orderBy(col("source"))
  }

  private val sourceMixtureSql =
    """WITH s AS (
      |  SELECT source, CAST(count(*) AS BIGINT) AS n_docs,
      |    CAST(sum(len(regexp_split_to_array(trim(text), '\s+'))) AS BIGINT) AS n_tok
      |  FROM documents GROUP BY source),
      |t AS (SELECT CAST(sum(n_tok) AS DOUBLE) AS n_all FROM s),
      |z AS (SELECT source, n_docs, n_tok,
      |        CAST(n_tok AS DOUBLE) / n_all AS p_nat
      |      FROM s CROSS JOIN t),
      |w AS (SELECT sum(sqrt(p_nat)) AS sum_sqrt FROM z)
      |SELECT source, n_docs, n_tok, p_nat,
      |  sqrt(p_nat) / sum_sqrt AS q_smooth,
      |  (sqrt(p_nat) / sum_sqrt) / p_nat AS boost
      |FROM z CROSS JOIN w ORDER BY source""".stripMargin

  // --------------------------------------------- p74 eval-side leak rate
  /** Per EVAL document: distinct 3-token shingles, how many of them occur
    * anywhere in the training split, and the leaked fraction. The raw
    * shingle set collapses map-side on the uniform shingle hash before the
    * join; the eval side is benchmark-sized, so AQE broadcasts it (same
    * posture as p25, pinned there both ways). */
  private def evalLeakRate(s: SparkSession, dir: String): DataFrame = {
    val pairs = CorpusOps.shinglePairs(s, dir)
    val evalP = pairs.filter(pmod(col("doc_id"), lit(17)) === 0)
    val rawSh = pairs.filter(pmod(col("doc_id"), lit(17)) =!= 0)
      .select(col("shingle")).distinct()
    val leaked = evalP.join(rawSh, Seq("shingle"))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("n_leaked"))
    evalP.groupBy(col("doc_id")).agg(count(lit(1)).as("n_shingles"))
      .join(leaked, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_shingles"),
        coalesce(col("n_leaked"), lit(0L)).as("n_leaked"))
      .withColumn("leak_ratio",
        col("n_leaked").cast("double") / col("n_shingles").cast("double"))
      .orderBy(col("doc_id"))
  }

  private val evalLeakSql =
    s"""WITH th AS (SELECT doc_id, ${PH.duckTokenHashes("text")} AS th FROM documents),
       |sh AS (SELECT doc_id, ${PH.duckShingles("th")} AS sh FROM th),
       |pairs AS (SELECT DISTINCT doc_id, unnest(sh) AS shingle FROM sh),
       |raw_sh AS (SELECT DISTINCT shingle FROM pairs WHERE doc_id % 17 <> 0),
       |leaked AS (
       |  SELECT p.doc_id, CAST(count(*) AS BIGINT) AS n_leaked
       |  FROM (SELECT * FROM pairs WHERE doc_id % 17 = 0) p
       |  JOIN raw_sh USING (shingle) GROUP BY p.doc_id)
       |SELECT e.doc_id,
       |  CAST(count(*) AS BIGINT) AS n_shingles,
       |  coalesce(any_value(l.n_leaked), 0) AS n_leaked,
       |  CAST(coalesce(any_value(l.n_leaked), 0) AS DOUBLE)
       |    / CAST(count(*) AS DOUBLE) AS leak_ratio
       |FROM (SELECT * FROM pairs WHERE doc_id % 17 = 0) e
       |LEFT JOIN leaked l ON e.doc_id = l.doc_id
       |GROUP BY e.doc_id ORDER BY e.doc_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("p72_dsir_weights", dsirWeights, Some(dsirSql)),
    Q("p73_source_mixture", sourceMixture, Some(sourceMixtureSql)),
    Q("p74_eval_leak_rate", evalLeakRate, Some(evalLeakSql)))
}
