package graft.pipeline

import graft.{Q, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus term statistics — the signals a training-data pipeline derives
  * from raw text before selection/mixing:
  *
  *  - **p40 TF-IDF top terms**: per-document top-3 terms by tf·idf — the
  *    classic keyword/topic signal (used for topical dedup, domain tagging,
  *    quality heuristics). Shapes: one explode, two hash aggregations, a
  *    vocabulary-sized join (AQE broadcasts the df side when small), and a
  *    per-document window — every key is high-cardinality (doc_id, term),
  *    nothing funnels through a single task at any scale.
  *  - **p41 trigram counts**: corpus-level n-gram language-model counts
  *    (the contamination/repetition statistic and the classic LM baseline).
  *    Trigrams are generated inside a single `transform` over the token
  *    array — no self-join — then one hash aggregation keyed by trigram.
  *
  * Both oracle-checked against DuckDB running its own list/lambda dialect.
  */
object TermStats {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  private def toks(s: SparkSession, dir: String): DataFrame =
    docs(s, dir).select(col("doc_id"),
      split(lower(trim(col("text"))), "\\s+").as("t"))

  // ------------------------------------------------------------ p40 tf-idf
  private def tfidfTopTerms(s: SparkSession, dir: String): DataFrame = {
    val terms = toks(s, dir).select(col("doc_id"), explode(col("t")).as("term"))
    val tf = terms.groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = terms.groupBy(col("term"))
      .agg(countDistinct(col("doc_id")).as("df"))
    val ndocs = terms.agg(countDistinct(col("doc_id")).as("n"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("tfidf").desc, col("term"))
    tf.join(dfreq, Seq("term"))
      .crossJoin(ndocs) // one-row aggregate: broadcast nested loop
      .withColumn("tfidf",
        col("tf").cast("double") * log(col("n").cast("double") / col("df").cast("double")))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("doc_id"), col("term"), col("tfidf"))
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))
  }

  private val tfidfSql =
    """WITH toks AS (
      |  SELECT doc_id, unnest(regexp_split_to_array(lower(trim(text)), '\s+')) AS term
      |  FROM documents),
      |tf AS (SELECT doc_id, term, count(*) AS tf FROM toks GROUP BY doc_id, term),
      |df AS (SELECT term, count(DISTINCT doc_id) AS df FROM toks GROUP BY term),
      |n AS (SELECT count(DISTINCT doc_id) AS n FROM toks)
      |SELECT doc_id, term, tfidf FROM (
      |  SELECT tf.doc_id, tf.term,
      |    CAST(tf.tf AS DOUBLE) * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) AS tfidf,
      |    row_number() OVER (PARTITION BY tf.doc_id
      |                       ORDER BY CAST(tf.tf AS DOUBLE)
      |                         * ln(CAST(n.n AS DOUBLE) / CAST(df.df AS DOUBLE)) DESC,
      |                         tf.term) AS rn
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n) q
      |WHERE rn <= 3
      |ORDER BY doc_id, tfidf DESC, term""".stripMargin

  // ----------------------------------------------------------- p41 trigrams
  private def trigramCounts(s: SparkSession, dir: String): DataFrame = {
    // trigrams from inside the token array: no self-join, no shuffle until
    // the final count; sequence guarded (Spark's sequence DESCENDS when
    // start > stop, so short docs must yield an empty array explicitly)
    val tri = expr(
      """transform(
        |  if(size(t) >= 3, sequence(1, size(t) - 2), array()),
        |  i -> concat(element_at(t, i), ' ', element_at(t, i + 1), ' ',
        |              element_at(t, i + 2)))""".stripMargin)
    toks(s, dir)
      .select(explode(tri).as("tri"))
      .groupBy(col("tri"))
      .agg(count(lit(1)).cast("long").as("n"))
      .orderBy(col("n").desc, col("tri"))
      .limit(50)
  }

  private val trigramSql =
    """WITH toks AS (
      |  SELECT doc_id, regexp_split_to_array(lower(trim(text)), '\s+') AS t
      |  FROM documents),
      |tris AS (
      |  SELECT unnest(CASE WHEN len(t) >= 3
      |    THEN list_transform(range(1, len(t) - 1),
      |           i -> t[i] || ' ' || t[i + 1] || ' ' || t[i + 2])
      |    ELSE [] END) AS tri
      |  FROM toks)
      |SELECT tri, CAST(count(*) AS BIGINT) AS n
      |FROM tris GROUP BY tri
      |ORDER BY n DESC, tri
      |LIMIT 50""".stripMargin

  val all: Seq[Q] = Seq(
    Q("p40_tfidf_top_terms", tfidfTopTerms, Some(tfidfSql)),
    Q("p41_trigram_counts", trigramCounts, Some(trigramSql)))
}
