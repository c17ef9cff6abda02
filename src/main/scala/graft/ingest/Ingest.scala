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
        // Spark's CSV reader has no skip-N option. Single-pass plan: the
        // driver streams the file HEAD until the n-th newline (a few bytes,
        // never a file pass) to prove the skipped lines sit inside the
        // first input split; then partition 0 — which for a Hadoop text
        // RDD over one file is always the offset-0 split — drops them
        // in place. No counting job, no second read of the file.
        // If the proof fails (n-th newline beyond the first block — a
        // pathological header), fall back to the exact two-pass global
        // index rather than risk a wrong drop.
        import spark.implicits._
        val lines = nthNewlineWithinFirstBlock(spark, path, n) match {
          case true =>
            spark.sparkContext.textFile(path, 1)
              .mapPartitionsWithIndex((i, it) => if (i == 0) it.drop(n) else it)
          case false =>
            spark.read.textFile(path).rdd.zipWithIndex()
              .filter(_._2 >= n).map(_._1)
        }
        r.csv(spark.createDataset(lines))
      case None => r.csv(path)
    }
    if (!hasHeader && opts.columns.isEmpty)
      df.toDF(df.columns.indices.map(i => s"column$i"): _*)
    else df
  }

  /** True iff the n-th newline of `path` lies strictly inside the file's
    * first block (split size is never below the FS block size when the RDD
    * is built with minPartitions=1, so "inside block 0" ⇒ "inside split 0").
    * Reads at most one block from the head. */
  private def nthNewlineWithinFirstBlock(spark: SparkSession, path: String, n: Int): Boolean = {
    val p = new org.apache.hadoop.fs.Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val st =
      try fs.getFileStatus(p)
      catch { case _: Exception => return false }
    if (st.isDirectory) return false // glob/dir input: line order is per-file
    val blockSize = math.max(st.getBlockSize, 1L)
    if (st.getLen <= blockSize) return true // single split: always safe
    val in = fs.open(p)
    try {
      var seen = 0
      var off = 0L
      val buf = new Array[Byte](64 * 1024)
      while (seen < n && off < blockSize) {
        val r = in.read(buf, 0, math.min(buf.length.toLong, blockSize - off).toInt)
        if (r < 0) return true // fewer than n lines in the whole file
        var i = 0
        while (i < r && seen < n) {
          if (buf(i) == '\n') seen += 1
          i += 1
        }
        off += i
      }
      seen >= n && off < blockSize
    } finally in.close()
  }
}
