package graft.pipeline

import graft.Q
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Composable training-data curation pipeline — the operators of this module
  * (dedup, quality, language, splits) chained as one declarative flow, the
  * way a 100 TB corpus actually gets built. Each stage is a DataFrame
  * transformation: the whole pipeline is ONE Catalyst plan (filters merge,
  * projections prune, nothing materializes until the sink), except the
  * explicitly-staged LSH candidate join.
  *
  * ```scala
  * TrainingPipeline(docs)
  *   .dedupeExact()
  *   .dedupeNear()                 // MinHash-LSH candidates → drop b-sides
  *   .filterQuality(minTokens = 5, maxCharsPerToken = 12.0)
  *   .withLanguage()
  *   .split(train = 0.8, valid = 0.1)
  *   .result
  * ```
  */
final class TrainingPipeline private (val result: DataFrame) {

  /** Keep one document per exact content duplicate group (min doc_id wins) —
    * a window over the content digest, no driver-side state. */
  def dedupeExact(): TrainingPipeline = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(md5(col("text"))).orderBy(col("doc_id"))
    new TrainingPipeline(
      result.withColumn("__rn", row_number().over(w))
        .filter(col("__rn") === 1).drop("__rn"))
  }

  /** Drop the higher-id side of every MinHash-LSH near-duplicate candidate
    * pair (the staged band join from DedupQueries). */
  def dedupeNear(): TrainingPipeline = {
    val spark = result.sparkSession
    val bands = DedupQueries.bandRows(DedupQueries.signatures(result))
    val a = bands.select(col("band").as("band_a"), col("band_sig").as("sig_a"),
      col("doc_id").as("doc_a"))
    val b = bands.select(col("band").as("band_b"), col("band_sig").as("sig_b"),
      col("doc_id").as("doc_b"))
    val losers = a.join(b,
        col("band_a") === col("band_b") && col("sig_a") === col("sig_b")
          && col("doc_a") < col("doc_b"))
      .select(col("doc_b").as("doc_id")).distinct()
    new TrainingPipeline(result.join(losers, Seq("doc_id"), "left_anti"))
  }

  /** Quality gates: token count and verbosity bounds (pure narrow filter). */
  def filterQuality(minTokens: Int, maxCharsPerToken: Double): TrainingPipeline = {
    // fully qualified: the split(train, valid) stage below shadows functions.split
    val toks = size(org.apache.spark.sql.functions.split(trim(col("text")), "\\s+"))
    new TrainingPipeline(result.filter(
      toks >= minTokens &&
        (length(col("text")).cast("double") / toks.cast("double")) <= maxCharsPerToken))
  }

  /** Attach the heuristic language prediction. */
  def withLanguage(): TrainingPipeline = {
    def hits(markers: Seq[String]): Column =
      markers.map(m =>
        when(concat(lit(" "), lower(col("text")), lit(" ")).like(s"% $m %"), 1)
          .otherwise(0)).reduce(_ + _)
    val en = hits(Seq("the", "a", "and", "of", "is"))
    val es = hits(Seq("el", "la", "de", "los", "es"))
    val fr = hits(Seq("le", "la", "et", "les", "est"))
    new TrainingPipeline(result.withColumn("pred_lang",
      when(en >= es && en >= fr && en > 0, "en")
        .when(es >= fr && es > 0, "es")
        .when(fr > 0, "fr").otherwise("und")))
  }

  /** Deterministic stratified subsample: keep the k "first" documents per
    * stratum under poly-hash order (reproducible balanced mixes; one
    * shuffle on the stratum key). */
  def sampleStratified(k: Int, strata: String*): TrainingPipeline = {
    val keys = if (strata.nonEmpty) strata else Seq("source", "lang")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keys.map(col): _*)
      .orderBy(expr(PortableHash.sparkCharHash("text")), col("doc_id"))
    new TrainingPipeline(
      result.withColumn("__rnk", row_number().over(w))
        .filter(col("__rnk") <= k).drop("__rnk"))
  }

  /** Drop documents sharing ≥ `maxRatio` of their 3-token shingles with a
    * benchmark/eval set (decontamination, the p25 kernel): a benchmark
    * suite is small by nature, and AQE broadcasts it from its MEASURED
    * size — no forced hint (r8), so a caller passing an unexpectedly large
    * eval frame degrades to a uniform shingle-keyed shuffle instead of an
    * unbounded driver collect. */
  def decontaminate(evalDocs: DataFrame, maxRatio: Double = 0.1): TrainingPipeline = {
    val shingled = (df: DataFrame) => df
      .withColumn("__th", expr(PortableHash.sparkTokenHashes("text")))
      .select(col("doc_id"), explode(expr(PortableHash.sparkShingles("__th"))).as("__sh"))
      .distinct()
    val evalSh = shingled(evalDocs).select(col("__sh")).distinct()
      .withColumn("__hit", lit(1))
    val contaminated = shingled(result)
      .join(evalSh, Seq("__sh"), "left_outer")
      .groupBy(col("doc_id"))
      .agg((count(col("__hit")).cast("double") / count(lit(1)).cast("double"))
        .as("__ratio"))
      .filter(col("__ratio") >= maxRatio)
      .select(col("doc_id"))
    new TrainingPipeline(result.join(contaminated, Seq("doc_id"), "left_anti"))
  }

  /** Repetition gate (the p26 kernel): drop documents whose duplicate-
    * sentence ratio exceeds `maxDupSentRatio` — pure narrow filter. */
  def filterRepetition(maxDupSentRatio: Double): TrainingPipeline = {
    val sents = org.apache.spark.sql.functions.split(col("text"), "\\.\\s+")
    val ratio = (size(sents) - size(array_distinct(sents))).cast("double") /
      size(sents).cast("double")
    new TrainingPipeline(result.filter(ratio <= maxDupSentRatio))
  }

  /** Deterministic shard layout (the p27 kernel): adds shard_id /
    * pos_in_shard; positions come from per-shard windows, never a global
    * rank. Write with `.result.write.partitionBy("shard_id")` for a
    * reproducible training layout. */
  def shardBy(nShards: Int): TrainingPipeline = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard_id")).orderBy(col("__h"), col("doc_id"))
    new TrainingPipeline(result
      .withColumn("__h",
        pmod(pmod(col("doc_id"), lit(PortableHash.P)) * 1103515245L + 12345L,
          lit(PortableHash.P)))
      .withColumn("shard_id", pmod(col("__h"), lit(nShards.toLong)))
      .withColumn("pos_in_shard", (row_number().over(w) - 1).cast("long"))
      .drop("__h"))
  }

  /** Deterministic train/valid/test assignment by id modulus. */
  def split(train: Double, valid: Double): TrainingPipeline = {
    val trainMax = (train * 10).toInt
    val validMax = trainMax + (valid * 10).toInt
    new TrainingPipeline(result.withColumn("split",
      when(pmod(col("doc_id"), lit(10)) < trainMax, "train")
        .when(pmod(col("doc_id"), lit(10)) < validMax, "valid")
        .otherwise("test")))
  }
}

object TrainingPipeline {
  def apply(docs: DataFrame): TrainingPipeline = new TrainingPipeline(docs)

  /** The end-to-end curation flow as a declared query (rows-only check):
    * per-split corpus stats after full dedupe + quality gates. */
  private def endToEnd(s: SparkSession, dir: String): DataFrame =
    TrainingPipeline(graft.Tables.load(s, dir, "documents"))
      .dedupeExact()
      .dedupeNear()
      .filterQuality(minTokens = 5, maxCharsPerToken = 12.0)
      .withLanguage()
      .split(train = 0.8, valid = 0.1)
      .result
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("total_chars"),
        countDistinct(col("pred_lang")).as("n_langs"))
      .orderBy(col("split"))

  /** The same flow as DuckDB CTEs — exact-dedupe window, the full portable
    * MinHash-LSH chain ([[PortableHash.duckLshCtes]]) over the deduped set,
    * quality/language/split stages, final per-split rollup. */
  private val endToEndSql = {
    def hits(markers: Seq[String]): String =
      markers.map(m => s"(CASE WHEN (' ' || lower(text) || ' ') LIKE '% $m %' THEN 1 ELSE 0 END)")
        .mkString("(", " + ", ")")
    s"""WITH exact AS (
       |  SELECT doc_id, text, lang, source, n_chars FROM (
       |    SELECT d.*, row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
       |    FROM documents d) t
       |  WHERE rn = 1),
       |${PortableHash.duckLshCtes("exact")},
       |losers AS (
       |  SELECT DISTINCT b.doc_id FROM bands a JOIN bands b
       |    ON a.band = b.band AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id),
       |neardup AS (
       |  SELECT e.* FROM exact e WHERE e.doc_id NOT IN (SELECT doc_id FROM losers)),
       |quality AS (
       |  SELECT *, len(regexp_split_to_array(trim(text), '\\s+')) AS toks FROM neardup),
       |filt AS (
       |  SELECT * FROM quality
       |  WHERE toks >= 5 AND CAST(length(text) AS DOUBLE) / CAST(toks AS DOUBLE) <= 12.0),
       |scored AS (
       |  SELECT *, ${hits(Seq("the", "a", "and", "of", "is"))} AS s_en,
       |            ${hits(Seq("el", "la", "de", "los", "es"))} AS s_es,
       |            ${hits(Seq("le", "la", "et", "les", "est"))} AS s_fr
       |  FROM filt),
       |lang2 AS (
       |  SELECT *, CASE WHEN s_en >= s_es AND s_en >= s_fr AND s_en > 0 THEN 'en'
       |                 WHEN s_es >= s_fr AND s_es > 0 THEN 'es'
       |                 WHEN s_fr > 0 THEN 'fr' ELSE 'und' END AS pred_lang
       |  FROM scored),
       |spl AS (
       |  SELECT *, CASE WHEN doc_id % 10 < 8 THEN 'train'
       |                 WHEN doc_id % 10 < 9 THEN 'valid'
       |                 ELSE 'test' END AS split
       |  FROM lang2)
       |SELECT split, count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       count(DISTINCT pred_lang) AS n_langs
       |FROM spl GROUP BY split ORDER BY split""".stripMargin
  }

  val all: Seq[Q] = Seq(Q("p20_training_pipeline", endToEnd, Some(endToEndSql)))
}
