package graft

import graft.session.{Engine, EngineConfig}
import org.apache.spark.sql.graftbridge.ArrowBridge
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Type-fidelity matrix mirroring the reference's batch_stream tests
  * (packages/duckdb-wasm/test/batch_stream.test.ts:23-89): 5 types × cast
  * exactness over 10k generated rows, through the engine SQL surface and the
  * Arrow wire format (SURVEY §7.1 M2). */
class TypeFidelitySpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private val cases: Seq[(String, DataType, Long => Any)] = Seq(
    ("TINYINT", ByteType, v => (v % 127).toByte),
    ("SMALLINT", ShortType, v => (v % 32000).toShort),
    ("INTEGER", IntegerType, v => (v % 1000000).toInt),
    ("BIGINT", LongType, v => v),
    ("DOUBLE", DoubleType, v => v.toDouble))

  cases.foreach { case (sqlType, sparkType, expect) =>
    test(s"$sqlType: 10k values exact through SQL + generate_series alias") {
      val mod = sqlType match {
        case "TINYINT" => "% 127"; case "SMALLINT" => "% 32000"
        case "INTEGER" => "% 1000000"; case _ => ""
      }
      val df = conn.queryDF(
        s"SELECT (v $mod)::$sqlType AS x FROM generate_series(0, 9999) t(v)")
      assert(df.schema("x").dataType === sparkType)
      val got = df.collect()
      assert(got.length === 10000)
      got.zipWithIndex.foreach { case (r, i) =>
        assert(r.get(0) === expect(i.toLong), s"row $i")
      }
    }
  }

  test("VARCHAR round-trip: 10k strings exact") {
    val got = conn.queryDF(
      "SELECT ('v_' || v::VARCHAR) AS s FROM generate_series(0, 9999) t(v)")
      .collect().map(_.getString(0))
    got.zipWithIndex.foreach { case (s, i) => assert(s === s"v_$i") }
  }

  test("values survive the Arrow IPC wire format bit-exactly") {
    val spark = SparkTestSession.spark
    val ipc = graft.results.ResultWriter.ipcStream(
      conn.queryDF("SELECT v::BIGINT AS b, (v / 7.0D)::DOUBLE AS d, " +
        "v::VARCHAR AS s FROM generate_series(0, 4999) t(v)"),
      emitBigInt = true)
    val back = ArrowBridge.fromIpcStream(spark, ipc)
      .orderBy("b").collect()
    assert(back.length === 5000)
    back.zipWithIndex.foreach { case (r, i) =>
      assert(r.getLong(0) === i.toLong)
      assert(r.getDouble(1) === i / 7.0)
      assert(r.getString(2) === i.toString)
    }
  }

  test("bitwise AND over generated series (batch_stream.test.ts:23,37)") {
    val got = conn.queryDF(
      "SELECT (v & 127)::SMALLINT AS m FROM generate_series(0, 999) t(v)")
      .collect().map(_.getShort(0))
    got.zipWithIndex.foreach { case (m, i) => assert(m === (i & 127).toShort) }
  }
}
