package graft

import graft.ingest.{IngestOptions, JsonIngest}
import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-10 pin of the sub-second timestamp timezone defect (r9 advice):
  * the COLUMN_OBJECT transcode path used to serialize sub-second
  * timestamps with `Timestamp.toString` (JVM-default zone, no offset)
  * while the NDJSON re-scan parses in the session zone (UTC) — under a
  * non-UTC default the value silently shifted. Both ingest arms must
  * yield the SAME instant for the same input, sub-second part intact. */
class JsonTimezoneSpec extends AnyFunSuite {
  import SparkTestSession.spark

  // sub-second timestamps are only producible under an EXPLICIT schema
  // (the analyzer's reference formats are second-precision and type the
  // column STRING otherwise), so the schema is pinned here
  private val schema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("i",
      org.apache.spark.sql.types.LongType),
    org.apache.spark.sql.types.StructField("t",
      org.apache.spark.sql.types.TimestampType)))

  private def instants(threshold: String, path: String): Map[Long, (Long, Int)] = {
    sys.props("graft.json.splitThreshold") = threshold
    JsonIngest.read(spark, path,
        IngestOptions(name = "tz_probe", columns = Some(schema)))
      .selectExpr("i", "unix_millis(t) AS ms").collect()
      .map(r => r.getLong(0) -> (r.getLong(1), (r.getLong(1) % 1000L).toInt))
      .toMap
  }

  test("sub-second COLUMN_OBJECT timestamps keep their instant under a non-UTC JVM default zone") {
    val json =
      """{"t": ["2024-06-01 10:00:00.5", "2024-06-01 10:00:01.25"], "i": [1, 2]}"""
    val p = Files.createTempFile("graft-tz", ".json")
    Files.writeString(p, json)
    val savedTz = java.util.TimeZone.getDefault
    val savedProp = sys.props.get("graft.json.splitThreshold")
    try {
      java.util.TimeZone.setDefault(
        java.util.TimeZone.getTimeZone("America/New_York"))
      // in-memory arm (driver-side transpose) vs transcode arm (NDJSON
      // round-trip) — the r9 defect made only the second shift by the
      // default-zone offset
      val inMem = instants(Long.MaxValue.toString, p.toString)
      val transcoded = instants("1", p.toString)
      assert(inMem === transcoded,
        s"transcode arm shifted the instant: $inMem vs $transcoded")
      // sub-second parts survive both arms
      assert(inMem(1L)._2 === 500 && inMem(2L)._2 === 250)
    } finally {
      java.util.TimeZone.setDefault(savedTz)
      savedProp match {
        case Some(v) => sys.props("graft.json.splitThreshold") = v
        case None => sys.props.remove("graft.json.splitThreshold")
      }
    }
  }
}
