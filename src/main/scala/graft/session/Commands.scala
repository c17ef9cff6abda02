package graft.session

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions.col
import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Non-SELECT command surface of the reference dialect:
  *  - `PRAGMA show_tables` → one `name` column (bindings.test.ts:43-51)
  *  - `COPY t TO 'f' (FORMAT CSV|PARQUET, ...)` incl. `COPY (SELECT ...) TO`
  *    single-file sinks (filesystem.test.ts:116-142,:246-259)
  *  - `EXPORT DATABASE 'dir' [(FORMAT PARQUET)]` — every table + schema.sql
  *    + load.sql (filesystem.test.ts:183-244)
  *
  * Spark writes part-directories; these sinks `coalesce(1)` and move the
  * single part to the exact requested filename for byte-level parity. (At
  * 100 TB a COPY would drop the coalesce and write a partitioned directory —
  * single-file output is inherently client-bound, like the reference's.)
  */
object Commands {

  private val ShowTables = """(?i)\s*PRAGMA\s+show_tables\s*""".r
  // source = lazy up to the LAST " TO '...'" clause so subqueries with
  // nested parens (COPY (SELECT count(*) ...) TO ...) parse correctly
  private val CopyTo =
    """(?is)\s*COPY\s+(.+)\s+TO\s+'([^']+)'\s*(?:\(?\s*(?:WITH\s*\()?(.*?)\)?\s*)?""".r
  private val ExportDb = """(?is)\s*EXPORT\s+DATABASE\s+'([^']+)'\s*(?:\(\s*FORMAT\s+(\w+)\s*\))?\s*""".r

  /** Returns Some(result) when the SQL is a command handled here. */
  def dispatch(conn: Connection, sql: String): Option[DataFrame] = sql match {
    case ShowTables() => Some(showTables(conn))
    case ExportDb(dir, fmt) => Some(exportDatabase(conn, dir, Option(fmt)))
    case CopyTo(src, target, opts) => Some(copyTo(conn, src.trim, target, Option(opts)))
    case _ => None
  }

  private def showTables(conn: Connection): DataFrame = {
    val spark = conn.engine.spark
    import spark.implicits._
    val names = spark.catalog.listTables().collect().map(_.name)
      .filterNot(_.startsWith("__graft_")).sorted.toSeq
    names.toDF("name")
  }

  /** Quote-aware option parsing: `DELIMITER ','` keeps its comma — options
    * are KEY [value] pairs where value is a quoted string or a bare word. */
  private def parseOpts(raw: Option[String]): Map[String, String] = {
    val Opt = """(\w+)(?:\s+('(?:[^']|'')*'|[^,()]+))?""".r
    raw.map { s =>
      Opt.findAllMatchIn(s).flatMap { m =>
        val k = m.group(1).toUpperCase
        val v = Option(m.group(2)).map(_.trim).map { t =>
          if (t.startsWith("'") && t.endsWith("'") && t.length >= 2)
            t.substring(1, t.length - 1).replace("''", "'")
          else t
        }.getOrElse("")
        if (k.nonEmpty) Some(k -> v) else None
      }.toMap
    }.getOrElse(Map.empty)
  }

  private def copyTo(conn: Connection, source: String, target: String,
      rawOpts: Option[String]): DataFrame = {
    val spark = conn.engine.spark
    val opts = parseOpts(rawOpts)
    val df0 =
      if (source.startsWith("(")) conn.queryDF(source.stripPrefix("(").stripSuffix(")"))
      else spark.table(source.replace("`", ""))
    // cache so the write and the returned count are ONE execution of the
    // source plan, not two
    val df = df0.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val fmt = opts.getOrElse("FORMAT", "CSV").toUpperCase
      val tmp = Files.createTempDirectory("graft-copy-").resolve("out")
      fmt match {
        case "PARQUET" =>
          df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
        case _ =>
          val header = opts.get("HEADER").forall(v => v == "1" || v.equalsIgnoreCase("true"))
          df.coalesce(1).write.mode(SaveMode.Overwrite)
            .option("header", header)
            .option("sep", opts.get("DELIMITER").filter(_.nonEmpty).getOrElse(","))
            .option("emptyValue", "")
            .csv(tmp.toString)
      }
      moveSinglePart(tmp, conn, target)
      import spark.implicits._
      Seq(df.count()).toDF("count")
    } finally df.unpersist()
  }

  /** Move the lone part file to the registered target name. */
  private def moveSinglePart(dir: Path, conn: Connection, target: String): Unit = {
    val part = Files.list(dir).iterator().asScala
      .filter { f => val n = f.getFileName.toString
        !n.startsWith(".") && !n.startsWith("_") }
      .toSeq.sortBy(_.getFileName.toString).head
    val resolved = conn.engine.files.resolve(target)
    val out = Paths.get(resolved)
    if (out.getParent != null) Files.createDirectories(out.getParent)
    Files.move(part, out, StandardCopyOption.REPLACE_EXISTING)
    if (!conn.engine.files.isRegistered(target))
      conn.engine.files.registerFilePath(target, out.toString)
  }

  /** EXPORT DATABASE: every table as csv/parquet + schema.sql + load.sql,
    * mirroring the reference's golden file list. */
  private def exportDatabase(conn: Connection, dir: String, fmt: Option[String]): DataFrame = {
    val spark = conn.engine.spark
    val parquet = fmt.exists(_.equalsIgnoreCase("PARQUET"))
    val out = Paths.get(dir)
    Files.createDirectories(out)
    val tables = spark.catalog.listTables().collect().map(_.name)
      .filterNot(_.startsWith("__graft_")).sorted
    val schemaSql = new StringBuilder
    val loadSql = new StringBuilder
    tables.foreach { t =>
      val df = spark.table(t)
      val file = out.resolve(if (parquet) s"$t.parquet" else s"$t.csv")
      val tmp = Files.createTempDirectory("graft-export-").resolve(t)
      if (parquet) df.coalesce(1).write.mode(SaveMode.Overwrite).parquet(tmp.toString)
      else df.coalesce(1).write.mode(SaveMode.Overwrite).option("header", "true").csv(tmp.toString)
      val part = Files.list(tmp).iterator().asScala
        .filter { f => val n = f.getFileName.toString
          !n.startsWith(".") && !n.startsWith("_") }.toSeq.head
      Files.move(part, file, StandardCopyOption.REPLACE_EXISTING)
      val cols = df.schema.fields
        .map(f => s"${f.name} ${f.dataType.sql}").mkString(", ")
      schemaSql.append(s"CREATE TABLE $t($cols);\n")
      loadSql.append(
        if (parquet) s"COPY $t FROM '${file}' (FORMAT 'parquet');\n"
        else s"COPY $t FROM '${file}' (FORMAT 'csv', quote '\"', delimiter ',', header 1);\n")
    }
    Files.writeString(out.resolve("schema.sql"), schemaSql.toString)
    Files.writeString(out.resolve("load.sql"), loadSql.toString)
    import spark.implicits._
    tables.toSeq.toDF("exported")
  }
}
