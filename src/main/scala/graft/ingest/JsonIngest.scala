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

  def read(spark: SparkSession, path: String, opts: IngestOptions): DataFrame =
    detectShape(path) match {
      case RowArray =>
        val schema = opts.columns.getOrElse(analyzeRowArray(path))
        spark.read.option("multiLine", "true").schema(schema).json(path)
      case NdJson =>
        opts.columns match {
          case Some(s) => spark.read.schema(s).json(path)
          case None => spark.read.json(path)
        }
      case ColumnObject =>
        val (schema, rows) = readColumnObject(path, opts.columns)
        spark.createDataFrame(rows.asJava, schema)
    }

  /** First structural token decides the shape (json_table.cc:320-330). */
  private[ingest] def detectShape(path: String): Shape = {
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
      // `{` then: values that are arrays ⇒ COLUMN_OBJECT; else NDJSON rows
      val p = new JsonFactory().createParser(t)
      try {
        p.nextToken() // START_OBJECT
        p.nextToken() // FIELD_NAME (or END_OBJECT)
        val v = p.nextToken()
        if (v == JsonToken.START_ARRAY) ColumnObject else NdJson
      } catch { case _: Exception => NdJson }
      finally p.close()
    }
  }

  // -------------------------------------------------------------- analyzer
  /** Per-field type statistics, reference counters (json_analyzer.cc:140-154). */
  private final class FieldStats {
    var ints, doubles, bools, strings, nulls, objects, arrays = 0L
    var minLong = Long.MaxValue
    var maxLong = Long.MinValue
    /** string candidate survivors (start all-true, knocked out per value) */
    var candTimestamp, candInt, candDouble, candBool = true
    var seen = 0L

    def observeLong(v: Long): Unit = {
      ints += 1; seen += 1
      if (v < minLong) minLong = v
      if (v > maxLong) maxLong = v
    }
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

    /** Resolve per reference preference order (json_analyzer.cc:256-295). */
    def resolve(): DataType = {
      if (seen == 0) return StringType // all-null/empty ⇒ NULL→STRING (§1.3)
      if (strings > 0 && strings == seen) {
        // pure string column: candidate preference TIMESTAMP(100) > INT(40/38)
        // > DOUBLE(20) > BOOL(10) > STRING(1)
        if (candTimestamp) return TimestampType
        if (candInt) return LongType
        if (candDouble) return DoubleType
        if (candBool) return BooleanType
        return StringType
      }
      if (strings > 0) return StringType // mixed string/non-string ⇒ string
      if (bools > 0)
        return if (bools == seen) BooleanType else StringType
      if (doubles > 0) return DoubleType
      if (ints > 0)
        // integer widening: int32 if all values fit, else int64 (:273-295)
        return if (minLong >= Int.MinValue && maxLong <= Int.MaxValue) IntegerType
        else LongType
      StringType
    }
  }

  private object Candidates {
    private val ts = Seq(
      java.time.format.DateTimeFormatter.ISO_OFFSET_DATE_TIME,
      java.time.format.DateTimeFormatter.ISO_LOCAL_DATE_TIME,
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
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
  private[ingest] def analyzeRowArray(path: String): StructType = {
    val stats = mutable.LinkedHashMap[String, FieldStats]()
    val p = new JsonFactory().createParser(Paths.get(path).toFile)
    try {
      require(p.nextToken() == JsonToken.START_ARRAY, "ROW_ARRAY must start with [")
      while (p.nextToken() == JsonToken.START_OBJECT) {
        var t = p.nextToken()
        while (t == JsonToken.FIELD_NAME) {
          val name = p.currentName()
          val st = stats.getOrElseUpdate(name, new FieldStats)
          p.nextToken() match {
            case JsonToken.VALUE_NUMBER_INT => st.observeLong(p.getLongValue)
            case JsonToken.VALUE_NUMBER_FLOAT => st.observeDouble()
            case JsonToken.VALUE_TRUE | JsonToken.VALUE_FALSE => st.observeBool()
            case JsonToken.VALUE_NULL => st.observeNull()
            case JsonToken.VALUE_STRING => st.observeString(p.getText)
            case JsonToken.START_OBJECT => st.objects += 1; st.seen += 1; p.skipChildren()
            case JsonToken.START_ARRAY => st.arrays += 1; st.seen += 1; p.skipChildren()
            case _ => ()
          }
          t = p.nextToken()
        }
      }
    } finally p.close()
    StructType(stats.toSeq.sortBy(_._1).map { case (n, st) =>
      StructField(n, st.resolve(), nullable = true)
    })
  }

  /** COLUMN_OBJECT: parse `{col: [v,...], ...}` driver-side, transpose. */
  private[ingest] def readColumnObject(path: String,
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
        val st = stats.getOrElseUpdate(name, new FieldStats)
        require(p.nextToken() == JsonToken.START_ARRAY, s"column $name must be an array")
        var v = p.nextToken()
        while (v != JsonToken.END_ARRAY) {
          v match {
            case JsonToken.VALUE_NUMBER_INT =>
              val l = p.getLongValue; st.observeLong(l); buf += l
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

  private def convert(v: Any, dt: DataType): Any = (v, dt) match {
    case (null, _) => null
    case (l: Long, IntegerType) => l.toInt
    case (l: Long, LongType) => l
    case (l: Long, DoubleType) => l.toDouble
    case (d: Double, DoubleType) => d
    case (s: String, LongType) => s.toLong
    case (s: String, IntegerType) => s.toInt
    case (s: String, DoubleType) => s.toDouble
    case (s: String, BooleanType) => s.equalsIgnoreCase("true")
    case (s: String, TimestampType) =>
      java.sql.Timestamp.valueOf(s.replace("T", " ").takeWhile(_ != '+'))
    case (b: Boolean, BooleanType) => b
    case (other, StringType) => other.toString
    case (other, _) => other
  }
}
