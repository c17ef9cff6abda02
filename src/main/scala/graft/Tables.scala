package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish tables (see TESTDATA.md).
  *
  * Each table is one parquet file under the scale-factor directory. Reads go
  * straight through `spark.read.parquet` so Catalyst's parquet source handles
  * predicate pushdown, column pruning and partition splitting — at 100 TB the
  * same call simply points at a directory of many files and the scan
  * parallelizes by row-group.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Per-session plan cache: repeated loads of the same table reuse the
    * resolved relation (file listing + parquet footer/schema read happen
    * once per session instead of once per query — measurable when a bench
    * run executes 60 queries back to back). DataFrames are immutable plans,
    * so sharing is safe. */
  private val planCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, String, String), DataFrame]()

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    planCache.computeIfAbsent(
      (System.identityHashCode(spark), dir, name), _ => doLoad(spark, dir, name))

  private def doLoad(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") {
      // events.ts is parquet TIMESTAMP(NANOS) which Spark's vectorized reader
      // rejects outright ([PARQUET_TYPE_ILLEGAL]). Read nanos as raw Long and
      // convert with exact integral division (a double roundtrip would lose
      // precision above 2^53).
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$dir/$name.parquet")
        .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
    } else {
      spark.read.parquet(s"$dir/$name.parquet")
    }

  /** Register every table as a temp view named exactly like the oracle's
    * table names, so `spark.sql` text matches DuckDB-side SQL 1:1. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}

/** One query in the engine's declared surface: the Spark plan plus (when the
  * semantics are ANSI-SQL-expressible) the equivalent DuckDB oracle SQL the
  * driver cross-checks against. `oracle == None` → driver does rows-only. */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])
