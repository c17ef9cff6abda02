package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Utility statements accepted for script portability: index DDL /
  * CHECKPOINT / VACUUM / ANALYZE as documented no-ops, SET/RESET over the
  * engine option map, current_setting() readback. */
class UtilityStatementsSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  test("index DDL, CHECKPOINT, VACUUM, ANALYZE are accepted no-ops") {
    for (stmt <- Seq(
      "CREATE INDEX idx_k ON t (k)",
      "CREATE UNIQUE INDEX IF NOT EXISTS u_idx ON t (k, v)",
      "DROP INDEX idx_k",
      "DROP INDEX IF EXISTS u_idx",
      "CHECKPOINT",
      "FORCE CHECKPOINT",
      "VACUUM",
      "VACUUM ANALYZE",
      "ANALYZE",
      "ANALYZE t"))
      assert(conn.queryDF(stmt).collect().isEmpty, s"not a no-op: $stmt")
    // the session still answers queries afterwards
    assert(conn.queryDF("SELECT 1 AS x").collect().head.get(0) === 1)
  }

  test("SET / RESET maintain the option map; current_setting reads back") {
    conn.queryDF("SET memory_limit = '2GB'")
    assert(conn.queryDF("SELECT current_setting('memory_limit') AS v")
      .collect().head.getString(0) === "2GB")
    conn.queryDF("SET threads TO 4")
    assert(conn.queryDF("SELECT current_setting('threads') AS v")
      .collect().head.get(0).toString === "4")
    conn.queryDF("RESET memory_limit")
    val ex = intercept[Exception] {
      conn.queryDF("SELECT current_setting('memory_limit')").collect()
    }
    assert(ex.getMessage.contains("unrecognized setting"))
  }

  test("threads default reflects the engine config") {
    val v = conn.queryDF("SELECT current_setting('threads') AS v")
      .collect().head.get(0).toString.toInt
    assert(v > 0)
  }

  test("current_setting inside a string literal is untouched") {
    val s = conn.queryDF("SELECT 'current_setting(''threads'')' AS s")
      .collect().head.getString(0)
    assert(s === "current_setting('threads')")
  }

  test("CREATE TABLE / CREATE VIEW are NOT swallowed by the index matcher") {
    conn.queryDF("CREATE OR REPLACE TEMP VIEW uts_v AS SELECT 7 AS x")
    assert(conn.queryDF("SELECT x FROM uts_v").collect().head.get(0) === 7)
  }
}
