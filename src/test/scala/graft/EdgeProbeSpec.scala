package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

class EdgeProbeSpec extends AnyFunSuite {
  test("edge probes") {
    val engine = new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
    val conn = engine.connect()
    for (q <- Seq(
      "SELECT CAST(2.7 AS INT) AS x", "SELECT CAST(-2.7 AS INT) AS x",
      "SELECT 2.7::INT AS x", "SELECT CAST(2.5 AS INT) AS x",
      "SELECT substr('hello', 0, 3) AS x",
      "SELECT -7 // 2 AS x", "SELECT -7.5 // 2 AS x",
      "SELECT round(2.5) AS x, round(-2.5) AS y",
      "SELECT date_part('dow', DATE '2020-01-05') AS x",
      "SELECT date_part('isodow', DATE '2020-01-05') AS x"))
      try info(q + "  =>  " + conn.queryDF(q).collect().head.toSeq.mkString(","))
      catch { case e: Exception => info(q + "  =>  ERR " + e.getMessage.take(60)) }
  }
}
