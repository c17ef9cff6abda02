package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.operators.{DialectQueries, ExtendedQueries, MicroQueries, OperatorQueries, RelationalQueries, ScalarExtras, TemporalJoins, WindowExtras}
import graft.pipeline.{Clustering, CorpusDiagnostics, CorpusOps, CurationExtras, CurationSelection, DedupQueries, MixtureOps, Multimodal, SemanticOps, Similarity, TermStats, TextQueries, TrainingPipeline}
import graft.streaming.StreamingQueries

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The declared surface is assembled from the per-module suites:
  *  - RelationalQueries: TPC-H-shaped coverage of SURVEY §2.2–2.6
  *  - OperatorQueries: set ops / windows / rollup / scalar functions (§2.5–2.8)
  *  - TextQueries / DedupQueries / Similarity: the LLM-data-pipeline
  *    extensions (dedup, ANN, text analysis) from the north-star spec.
  */
object SparkEntry {

  val allQueries: Seq[Q] =
    RelationalQueries.all ++ OperatorQueries.all ++ ExtendedQueries.all ++ WindowExtras.all ++ ScalarExtras.all ++ TemporalJoins.all ++ DialectQueries.all ++
      MicroQueries.all ++ TextQueries.all ++ DedupQueries.all ++
      Similarity.all ++ Multimodal.all ++ TrainingPipeline.all ++
      CorpusOps.all ++ CurationExtras.all ++ CurationSelection.all ++
      Clustering.all ++ TermStats.all ++ SemanticOps.all ++
      CorpusDiagnostics.all ++ MixtureOps.all ++ StreamingQueries.all

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    allQueries.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    allQueries.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    allQueries.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
