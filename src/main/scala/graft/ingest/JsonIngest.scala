package graft.ingest

import com.fasterxml.jackson.core.{JsonFactory, JsonParser, JsonToken}
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._
import java.nio.file.{Files, Paths}
import scala.collection.mutable
import scala.jdk.CollectionConverters._

/** JSON ingest with the reference's document-shape auto-detection
  * (lib/include/duckdb/web/json_insert_options.h:16-27; readers
  * lib/src/json_table.cc:163-330; analyzer lib/src/json_analyzer.cc):
  *
  *  - ROW_ARRAY `[{"a":1}, ...]` — parsed distributed via Spark's JSON
  *    source (multiLine), with the schema pinned by our analyzer so the
  *    reference's type-preference rules apply, not Spark's defaults.
  *  - COLUMN_OBJECT `{"a":[1,...], "b":[...]}` — a single object can't be
  *    split; parsed driver-side and parallelized (ingest buffers are
  *    client-local in the reference too).
  *  - NDJSON (one object per line) — accepted as a Spark-native bonus.
  *
  * Analyzer semantics ported from json_analyzer.cc:191-295: integers widen
  * int32→int64, any conflict ⇒ double; strings are candidate-tested with
  * preference TIMESTAMP > INT32 > INT64 > DOUBLE > BOOL > STRING; struct
  * fields sorted by name (:416). (Unsigned types don't exist in Spark —
  * SURVEY §1.3 documents the widening.)
  */
object JsonIngest {

  sealed trait Shape
  case object RowArray extends Shape
  case object ColumnObject extends Shape
  case object NdJson extends Shape

  /** ROW_ARRAY files at or above this size are transcoded to NDJSON before
    * the distributed read: `multiLine` JSON is UNSPLITTABLE (the whole file
    * is one scan task — a 10 GB document parses on one core), while the
    * line-delimited form splits at `spark.sql.files.maxPartitionBytes` like
    * any text source. The transcode itself is a single driver-side
    * streaming byte-copy (constant memory, I/O-rate not parse-rate); the
    * expensive part — per-row JSON parsing — runs distributed after it.
    * Overridable for tests via -Dgraft.json.splitThreshold. */
  private[graft] def rowArraySplitThreshold: Long =
    sys.props.get("graft.json.splitThreshold").map(_.toLong)
      .getOrElse(32L * 1024 * 1024)

  def read(spark: SparkSession, path: String, opts: IngestOptions): DataFrame =
    detectShape(path) match {
      case RowArray =>
        val schema = opts.columns.getOrElse(analyzeRowArray(path))
        if (Files.size(Paths.get(path)) >= rowArraySplitThreshold)
          spark.read.schema(schema).json(transcodeRowArrayToNdjson(path, spark))
        else
          spark.read.option("multiLine", "true").schema(schema).json(path)
      case NdJson =>
        opts.columns match {
          case Some(s) => spark.read.schema(s).json(path)
          case None => spark.read.json(path)
        }
      case ColumnObject =>
        if (Files.size(Paths.get(path)) >= rowArraySplitThreshold) {
          val (schema, ndjson) = transcodeColumnObjectToNdjson(path, opts.columns, spark)
          spark.read.schema(schema).json(ndjson)
        } else {
          val (schema, rows) = readColumnObject(path, opts.columns)
          spark.createDataFrame(rows.asJava, schema)
        }
    }

  /** First structural token decides the shape (json_table.cc:320-330). */
  private[graft] def detectShape(path: String): Shape = {
    val head = {
      val in = Files.newInputStream(Paths.get(path))
      try {
        val buf = new Array[Byte](4096)
        val n = math.max(in.read(buf), 0)
        new String(buf, 0, n, "UTF-8")
      } finally in.close()
    }
    val t = head.dropWhile(_.isWhitespace)
    if (t.startsWith("[")) RowArray
    else {
      // `{` then: values that are arrays ⇒ COLUMN_OBJECT; else NDJSON rows.
      // An empty object is COLUMN_OBJECT with zero columns (analyzer golden
      // "cols_empty", json_analyzer_test.cc).
      val p = new JsonFactory().createParser(t)
      try {
        p.nextToken() // START_OBJECT
        p.nextToken() match {
          case JsonToken.END_OBJECT => ColumnObject
          case JsonToken.FIELD_NAME =>
            if (p.nextToken() == JsonToken.START_ARRAY) ColumnObject else NdJson
          case _ => NdJson
        }
      } catch { case _: Exception => NdJson }
      finally p.close()
    }
  }

  // -------------------------------------------------------------- analyzer
  /** Per-field type statistics, reference counters (json_analyzer.cc:140-154).
    * Resolution rules replicate the reference's *tested* behavior
    * (lib/test/json_analyzer_test.cc goldens), with unsigned types widened
    * per SURVEY §1.3: uint32 → LongType, uint64 → DecimalType(20,0). */
  private[ingest] final class FieldStats(rowShape: Boolean) {
    var ints, doubles, bools, strings, nulls, objects, arrays, bigints = 0L
    var minLong = Long.MaxValue
    var maxLong = Long.MinValue
    /** string candidate survivors (start all-true, knocked out per value) */
    var candTimestamp, candInt, candDouble, candBool = true
    var seen = 0L
    /** nested-object field stats (rows_nested_1: numbers fingerprint to
      * double inside nested structs) */
    var nested: mutable.LinkedHashMap[String, FieldStats] = _

    def observeLong(v: Long): Unit = {
      ints += 1; seen += 1
      if (v < minLong) minLong = v
      if (v > maxLong) maxLong = v
    }
    /** JSON integer beyond int64 range (uint64 territory). */
    def observeBigInt(): Unit = { bigints += 1; seen += 1 }
    def observeDouble(): Unit = { doubles += 1; seen += 1 }
    def observeBool(): Unit = { bools += 1; seen += 1 }
    def observeNull(): Unit = { nulls += 1 }
    def observeString(s: String): Unit = {
      strings += 1; seen += 1
      if (candTimestamp && !Candidates.isTimestamp(s)) candTimestamp = false
      if (candInt && !Candidates.isLong(s)) candInt = false
      if (candDouble && !Candidates.isDouble(s)) candDouble = false
      if (candBool && !Candidates.isBool(s)) candBool = false
    }

    private def hasNegative: Boolean = ints > 0 && minLong < 0

    /** Resolve per reference preference order (json_analyzer.cc:256-295,
      * :354-356) — see golden table in JsonGoldenSpec. */
    def resolve(): DataType = {
      if (seen == 0) return StringType // all-null/empty ⇒ NULL→STRING (§1.3)
      if (objects > 0 && objects == seen && nested != null) {
        // nested struct: fields sorted, numerics fingerprint to double
        return StructType(nested.toSeq.sortBy(_._1).map { case (n, st) =>
          StructField(n, st.resolveNestedLeaf(), nullable = true)
        })
      }
      if (strings > 0) {
        // timestamp candidates survive mixing with ints (goldens
        // cols/rows_timestamp_mixed_1: ints are epoch seconds)
        if (candTimestamp && doubles == 0 && bools == 0 && bigints == 0)
          return TimestampType
        if (strings == seen) {
          // pure string column: preference TIMESTAMP(100) > INT(40/38)
          // > DOUBLE(20) > BOOL(10) > STRING(1)
          if (candInt) return LongType
          if (candDouble) return DoubleType
          if (candBool) return BooleanType
        }
        return StringType
      }
      if (bigints > 0)
        // uint64 unless a negative value forces double
        // (cols_u64 vs cols_u64_sign_conflict)
        return if (hasNegative || doubles > 0) DoubleType else DecimalType(20, 0)
      if (doubles > 0) return DoubleType // any double (incl. bool/int mix)
      if (bools > 0)
        // bool-only ⇒ bool; bool mixed with ints ⇒ double (cols_f64_mixed_1)
        return if (bools == seen) BooleanType else DoubleType
      if (ints > 0) {
        if (minLong >= Int.MinValue && maxLong <= Int.MaxValue) return IntegerType
        // sign-conflict beyond int32: the reference's ROW path resolves
        // uint64 where the COLUMN path resolves int64 (json_analyzer.cc:
        // 354-356 quirk, pinned by rows_ vs cols_i32_sign_conflict) —
        // replicate the tested behavior, not the apparent intent.
        if (rowShape && hasNegative) return DecimalType(20, 0)
        return LongType
      }
      StringType
    }

    /** Leaf type inside a nested struct: numerics → double (median
      * fingerprint behavior, rows_nested_1). */
    private def resolveNestedLeaf(): DataType = {
      if (seen == 0) StringType
      else if (strings > 0) StringType
      else if (ints + doubles + bigints > 0) DoubleType
      else if (bools > 0) BooleanType
      else StringType
    }
  }

  private[ingest] object Candidates {
    private val ts = Seq(
      "yyyy-MM-dd HH:mm:ss", "yyyy-MM-dd HH:mm", "yyyy-MM-dd'T'HH:mm:ss")
      .map(java.time.format.DateTimeFormatter.ofPattern)
    def isTimestamp(s: String): Boolean =
      ts.exists { f => try { f.parse(s); true } catch { case _: Exception => false } }
    def isLong(s: String): Boolean = s.nonEmpty && s.forall(c => c.isDigit || c == '-') &&
      (try { s.toLong; true } catch { case _: Exception => false })
    def isDouble(s: String): Boolean =
      try { s.trim.nonEmpty && { s.toDouble; true } } catch { case _: Exception => false }
    def isBool(s: String): Boolean =
      s == "true" || s == "false" || s == "True" || s == "False"
  }

  /** Stream the ROW_ARRAY document once, gather stats, emit the schema with
    * fields sorted by name (json_analyzer.cc:416). */
  /** Shared per-value observation incl. int64-overflow and nested-object
    * recursion (one level, per the reference's fingerprint sampling). */
  private def observeValue(p: JsonParser, st: FieldStats, tok: JsonToken,
      rowShape: Boolean): Unit = tok match {
    case JsonToken.VALUE_NUMBER_INT =>
      if (p.getNumberType == JsonParser.NumberType.BIG_INTEGER) st.observeBigInt()
      else st.observeLong(p.getLongValue)
    case JsonToken.VALUE_NUMBER_FLOAT => st.observeDouble()
    case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => st.observeBool()
    case JsonToken.VALUE_NULL => st.observeNull()
    case JsonToken.VALUE_STRING => st.observeString(p.getText)
    case JsonToken.START_OBJECT =>
      st.objects += 1; st.seen += 1
      if (st.nested == null) st.nested = mutable.LinkedHashMap[String, FieldStats]()
      var t = p.nextToken()
      while (t == JsonToken.FIELD_NAME) {
        val sub = st.nested.getOrElseUpdate(p.currentName(), new FieldStats(rowShape))
        val vt = p.nextToken()
        if (vt == JsonToken.START_OBJECT || vt == JsonToken.START_ARRAY) {
          sub.objects += 1; sub.seen += 1; p.skipChildren()
        } else observeValue(p, sub, vt, rowShape)
        t = p.nextToken()
      }
    case JsonToken.START_ARRAY => st.arrays += 1; st.seen += 1; p.skipChildren()
    case _ => ()
  }

  /** Where a staged NDJSON file must live so EXECUTORS can read it:
    *  - explicit `-Dgraft.json.stagingDir` always wins (any Hadoop URI);
    *  - `local[*]` masters share the driver filesystem → `None` (driver
    *    temp dir);
    *  - any other master auto-routes to `<spark.sql.warehouse.dir>/
    *    graft-json-staging` — the warehouse is shared storage by
    *    deployment contract, so the staged file can't silently be a
    *    driver-local path that fails at scan time on a cluster. */
  private[graft] def stagingDirFor(master: String, warehouseDir: String): Option[String] =
    sys.props.get("graft.json.stagingDir").orElse {
      if (master.startsWith("local")) None
      else Some(warehouseDir.stripSuffix("/") + "/graft-json-staging")
    }

  /** Open a staged output file through the Hadoop filesystem of the chosen
    * staging dir (handles hdfs:/s3:/file: URIs uniformly), or the driver's
    * temp dir when staging is local. Returns (readable path, stream). */
  private def openStaged(spark: SparkSession, suffix: String)
      : (String, java.io.OutputStream) =
    stagingDirFor(spark.sparkContext.master,
        spark.conf.get("spark.sql.warehouse.dir")) match {
      case None =>
        val p = Files.createTempFile("graft-ndjson-", suffix)
        p.toFile.deleteOnExit()
        (p.toString, Files.newOutputStream(p))
      case Some(dir) =>
        val hp = new org.apache.hadoop.fs.Path(
          dir, s"graft-${java.util.UUID.randomUUID()}$suffix")
        val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
        fs.deleteOnExit(hp)
        (hp.toString, fs.create(hp))
    }

  /** One streaming pass turning `[{...}, {...}]` into one-object-per-line
    * NDJSON (JSON strings cannot contain a literal newline, so each copied
    * object is exactly one line). Constant memory: jackson streams
    * parser→generator per object, nothing is materialized. The output
    * lands where [[stagingDirFor]] says executors can read it. */
  private[graft] def transcodeRowArrayToNdjson(path: String,
      spark: SparkSession): String = {
    val (outPath, out) = openStaged(spark, ".json")
    val f = new JsonFactory()
    val p = f.createParser(Paths.get(path).toFile)
    val g = f.createGenerator(out)
    g.setRootValueSeparator(new com.fasterxml.jackson.core.io.SerializedString("\n"))
    try {
      require(p.nextToken() == JsonToken.START_ARRAY, "ROW_ARRAY must start with [")
      var t = p.nextToken()
      while (t == JsonToken.START_OBJECT) {
        g.copyCurrentStructure(p)
        t = p.nextToken()
      }
    } finally { g.close(); p.close() }
    outPath
  }

  private[graft] def analyzeRowArray(path: String): StructType = {
    val stats = mutable.LinkedHashMap[String, FieldStats]()
    val p = new JsonFactory().createParser(Paths.get(path).toFile)
    try {
      require(p.nextToken() == JsonToken.START_ARRAY, "ROW_ARRAY must start with [")
      while (p.nextToken() == JsonToken.START_OBJECT) {
        var t = p.nextToken()
        while (t == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          val st = stats.getOrElseUpdate(name, new FieldStats(rowShape = true))
          observeValue(p, st, p.nextToken(), rowShape = true)
          t = p.nextToken()
        }
      }
    } finally p.close()
    StructType(stats.toSeq.sortBy(_._1).map { case (n, st) =>
      StructField(n, st.resolve(), nullable = true)
    })
  }

  /** COLUMN_OBJECT: parse `{col: [v,...], ...}` driver-side, transpose. */
  private[graft] def readColumnObject(path: String,
      explicit: Option[StructType]): (StructType, Seq[Row]) = {
    val columns = mutable.LinkedHashMap[String, mutable.ArrayBuffer[Any]]()
    val stats = mutable.LinkedHashMap[String, FieldStats]()
    val p = new JsonFactory().createParser(Paths.get(path).toFile)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT, "COLUMN_OBJECT must start with {")
      var t = p.nextToken()
      while (t == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        val buf = columns.getOrElseUpdate(name, mutable.ArrayBuffer[Any]())
        val st = stats.getOrElseUpdate(name, new FieldStats(rowShape = false))
        require(p.nextToken() == JsonToken.START_ARRAY, s"column $name must be an array")
        var v = p.nextToken()
        while (v != JsonToken.END_ARRAY) {
          v match {
            case JsonToken.VALUE_NUMBER_INT =>
              if (p.getNumberType == JsonParser.NumberType.BIG_INTEGER) {
                st.observeBigInt(); buf += new java.math.BigDecimal(p.getBigIntegerValue)
              } else { val l = p.getLongValue; st.observeLong(l); buf += l }
            case JsonToken.VALUE_NUMBER_FLOAT =>
              st.observeDouble(); buf += p.getDoubleValue
            case JsonToken.VALUE_TRUE => st.observeBool(); buf += true
            case JsonToken.VALUE_FALSE => st.observeBool(); buf += false
            case JsonToken.VALUE_NULL => st.observeNull(); buf += null
            case JsonToken.VALUE_STRING =>
              val s = p.getText; st.observeString(s); buf += s
            case _ => p.skipChildren(); buf += null
          }
          v = p.nextToken()
        }
        t = p.nextToken()
      }
    } finally p.close()

    val schema = explicit.getOrElse(
      StructType(stats.toSeq.sortBy(_._1).map { case (n, st) =>
        StructField(n, st.resolve(), nullable = true)
      }))
    val names = schema.fields.map(_.name)
    val height = columns.values.map(_.length).maxOption.getOrElse(0)
    val rows = (0 until height).map { i =>
      Row.fromSeq(names.toIndexedSeq.map { n =>
        val raw = columns.get(n).flatMap(b => if (i < b.length) Option(b(i)) else None)
        convert(raw.orNull, schema(n).dataType)
      })
    }
    (schema, rows)
  }

  /** Splittable COLUMN_OBJECT ingest (files ≥ the split threshold): the
    * single root object can't be split for a distributed scan, and the
    * in-memory transpose above holds the WHOLE table in driver
    * ArrayBuffers. This path keeps driver memory constant and hands the
    * schema-directed row parse to a splittable distributed scan:
    *
    *   1. ONE streaming pass over the file writes each column's values to
    *      its own driver-local chunk file, one JSON value per line
    *      (jackson escapes newlines inside strings, so line = value),
    *      while gathering the same [[FieldStats]] the in-memory path uses;
    *   2. a zip merge opens ALL column chunks simultaneously and streams
    *      row objects to NDJSON — memory is one value per column, and the
    *      resolved schema drives the same [[convert]] coercions
    *      (candidate-promoted strings→numbers, epoch/string→timestamp) so
    *      the two paths are value-identical;
    *   3. the NDJSON lands where [[stagingDirFor]] says executors can read
    *      it and is scanned with the pinned schema — splittable at
    *      `spark.sql.files.maxPartitionBytes` like any text source.
    *
    * Timestamps are emitted as epoch-second NUMBERS (Spark's JSON reader
    * maps integer tokens to seconds for TimestampType), which preserves
    * the in-memory path's instant semantics without round-tripping through
    * timezone-sensitive strings; sub-second values (not producible by the
    * reference's second-precision formats) fall back to ISO-8601 with an
    * explicit UTC offset, immune to the JVM default zone. */
  private[graft] def transcodeColumnObjectToNdjson(path: String,
      explicit: Option[StructType], spark: SparkSession): (StructType, String) = {
    val f = new JsonFactory()
    // ---- pass 1: per-column chunk files + field stats, constant memory
    val chunkDir = Files.createTempDirectory("graft-colobj-")
    chunkDir.toFile.deleteOnExit()
    val chunks = mutable.LinkedHashMap[String, java.nio.file.Path]()
    val stats = mutable.LinkedHashMap[String, FieldStats]()
    val p = f.createParser(Paths.get(path).toFile)
    try {
      require(p.nextToken() == JsonToken.START_OBJECT, "COLUMN_OBJECT must start with {")
      var t = p.nextToken()
      var i = 0
      while (t == JsonToken.FIELD_NAME) {
        val name = p.currentName()
        val st = stats.getOrElseUpdate(name, new FieldStats(rowShape = false))
        val chunk = chunkDir.resolve(s"c$i.jsonl"); i += 1
        chunks(name) = chunk
        chunk.toFile.deleteOnExit()
        val g = f.createGenerator(Files.newOutputStream(chunk))
        g.setRootValueSeparator(new com.fasterxml.jackson.core.io.SerializedString("\n"))
        require(p.nextToken() == JsonToken.START_ARRAY, s"column $name must be an array")
        var v = p.nextToken()
        while (v != JsonToken.END_ARRAY) {
          v match {
            case JsonToken.VALUE_NUMBER_INT =>
              if (p.getNumberType == JsonParser.NumberType.BIG_INTEGER) {
                st.observeBigInt(); g.writeNumber(p.getBigIntegerValue)
              } else { val l = p.getLongValue; st.observeLong(l); g.writeNumber(l) }
            case JsonToken.VALUE_NUMBER_FLOAT =>
              st.observeDouble(); g.writeNumber(p.getDoubleValue)
            case JsonToken.VALUE_TRUE => st.observeBool(); g.writeBoolean(true)
            case JsonToken.VALUE_FALSE => st.observeBool(); g.writeBoolean(false)
            case JsonToken.VALUE_NULL => st.observeNull(); g.writeNull()
            case JsonToken.VALUE_STRING =>
              val s = p.getText; st.observeString(s); g.writeString(s)
            // non-scalar cells → NULL, same as the in-memory transpose
            case _ => p.skipChildren(); g.writeNull()
          }
          v = p.nextToken()
        }
        g.close()
        t = p.nextToken()
      }
    } finally p.close()

    val schema = explicit.getOrElse(
      StructType(stats.toSeq.sortBy(_._1).map { case (n, st) =>
        StructField(n, st.resolve(), nullable = true)
      }))

    // ---- pass 2: zip the column chunks into schema-coerced NDJSON rows
    val (outPath, out) = openStaged(spark, ".json")
    val g = f.createGenerator(out)
    g.setRootValueSeparator(new com.fasterxml.jackson.core.io.SerializedString("\n"))
    val readers = chunks.map { case (n, c) => n -> f.createParser(c.toFile) }
    try {
      var more = true
      while (more) {
        // one token per column per row; a column is exhausted when its
        // parser returns null — shorter columns pad with NULL (same
        // "height = longest column" rule as the in-memory path)
        val rowRaw = readers.map { case (n, rp) =>
          val tok = rp.nextToken()
          val raw: Option[Any] = tok match {
            case null => None
            case JsonToken.VALUE_NUMBER_INT =>
              Some(if (rp.getNumberType == JsonParser.NumberType.BIG_INTEGER)
                new java.math.BigDecimal(rp.getBigIntegerValue) else rp.getLongValue)
            case JsonToken.VALUE_NUMBER_FLOAT => Some(rp.getDoubleValue)
            case JsonToken.VALUE_TRUE => Some(true)
            case JsonToken.VALUE_FALSE => Some(false)
            case JsonToken.VALUE_STRING => Some(rp.getText)
            case JsonToken.VALUE_NULL => Some(null)
            case other => Some(null) // unreachable: pass 1 wrote scalars only
          }
          n -> raw
        }
        more = rowRaw.exists { case (_, raw) => raw.isDefined }
        if (more) {
          g.writeStartObject()
          schema.fields.foreach { fld =>
            val raw = rowRaw.get(fld.name).flatten.orNull
            g.writeFieldName(fld.name)
            convert(raw, fld.dataType) match {
              case null => g.writeNull()
              case i: Int => g.writeNumber(i)
              case l: Long => g.writeNumber(l)
              case d: Double => g.writeNumber(d)
              case b: java.math.BigDecimal => g.writeNumber(b)
              case b: Boolean => g.writeBoolean(b)
              case s: String => g.writeString(s)
              case t: java.sql.Timestamp =>
                // sub-second fallback carries an EXPLICIT UTC offset
                // (Instant.toString → "…T….123Z"): Timestamp.toString
                // renders in the JVM-default zone while the NDJSON
                // re-scan parses in the session zone (UTC), so a default
                // zone ≠ UTC silently shifted sub-second values (r9
                // advice). toInstant keeps nanos.
                if (t.getTime % 1000L == 0L) g.writeNumber(t.getTime / 1000L)
                else g.writeString(t.toInstant.toString)
              case other => g.writeString(other.toString)
            }
          }
          g.writeEndObject()
        }
      }
    } finally {
      g.close()
      readers.values.foreach(_.close())
      chunks.values.foreach(c => Files.deleteIfExists(c))
      Files.deleteIfExists(chunkDir)
    }
    (schema, outPath)
  }

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (l: Long, _: DecimalType) => java.math.BigDecimal.valueOf(l)
    // epoch seconds mixed into a timestamp column (cols_timestamp_mixed_1)
    case (l: Long, TimestampType) => new java.sql.Timestamp(l * 1000L)
    case (d: Double, DoubleType) => d
    case (b: java.math.BigDecimal, _: DecimalType) => b
    case (b: java.math.BigDecimal, DoubleType) => b.doubleValue()
    case (s: String, LongType) => s.toLong
    case (s: String, IntegerType) => s.toInt
    case (s: String, DoubleType) => s.toDouble
    case (s: String, BooleanType) => s.equalsIgnoreCase("true")
    case (s: String, TimestampType) =>
      val norm = s.replace("T", " ").takeWhile(_ != '+')
      val padded = if (norm.count(_ == ':') == 1) norm + ":00" else norm
      java.sql.Timestamp.valueOf(padded)
    case (b: Boolean, BooleanType) => b
    case (b: Boolean, DoubleType) => if (b) 1.0 else 0.0
    case (other, StringType) => other.toString
    case (other, _) => other
  }
}
