package graft.ingest

import graft.dialect.Strftime
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Shared ingest options — union of the reference's CSVInsertOptions /
  * JSONInsertOptions / ArrowInsertOptions (lib/include/duckdb/web/
  * csv_insert_options.h:17-45, json_insert_options.h, arrow_insert_options.h:
  * 16-27): target schema.table, create-vs-append, format details, optional
  * explicit column types. */
final case class IngestOptions(
    name: String,
    schema: String = "main",
    create: Boolean = true,
    header: Option[Boolean] = None,
    delimiter: Option[String] = None,
    quote: Option[String] = None,
    escape: Option[String] = None,
    skip: Option[Int] = None,
    detect: Boolean = true,
    dateFormat: Option[String] = None, // strftime-style, like the reference
    timestampFormat: Option[String] = None,
    columns: Option[StructType] = None)

/** CSV ingest: option translation onto Spark's CSV reader (SURVEY §1.4).
  * Headerless default column names are column0..N like the reference
  * (insert_csv.test.ts:59-71), not Spark's _c0..N. */
object CsvIngest {
  def read(spark: SparkSession, path: String, opts: IngestOptions): DataFrame = {
    var r = spark.read
    val hasHeader = opts.header.getOrElse(true)
    r = r.option("header", hasHeader.toString)
    opts.delimiter.foreach(d => r = r.option("sep", d))
    opts.quote.foreach(q => r = r.option("quote", q))
    opts.escape.foreach(e => r = r.option("escape", e))
    opts.dateFormat.foreach(f => r = r.option("dateFormat", Strftime.toJavaPattern(f)))
    opts.timestampFormat.foreach(f =>
      r = r.option("timestampFormat", Strftime.toJavaPattern(f)))
    opts.columns match {
      case Some(schema) => r = r.schema(schema)
      case None => r = r.option("inferSchema", opts.detect.toString)
    }
    val df = opts.skip.filter(_ > 0) match {
      case Some(n) =>
        // Spark's CSV reader has no skip-N option — drop the first N
        // physical lines via a global line index (zipWithIndex preserves
        // file order across splits), then parse the remainder.
        import spark.implicits._
        val lines = spark.read.textFile(path).rdd.zipWithIndex()
          .filter(_._2 >= n).map(_._1)
        r.csv(spark.createDataset(lines))
      case None => r.csv(path)
    }
    if (!hasHeader && opts.columns.isEmpty)
      df.toDF(df.columns.indices.map(i => s"column$i"): _*)
    else df
  }
}
