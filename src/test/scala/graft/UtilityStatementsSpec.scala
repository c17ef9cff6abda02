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
      "CREATE INDEX IF NOT EXISTS n_idx ON t (k, v)",
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

  test("CREATE UNIQUE INDEX loud-rejects (engine can't enforce uniqueness)") {
    val ex = intercept[UnsupportedOperationException] {
      conn.queryDF("CREATE UNIQUE INDEX u_idx ON t (k, v)")
    }
    assert(ex.getMessage.contains("UNIQUE"))
    val ex2 = intercept[UnsupportedOperationException] {
      conn.queryDF("CREATE UNIQUE INDEX IF NOT EXISTS u_idx ON t (k)")
    }
    assert(ex2.getMessage.contains("UNIQUE"))
  }

  test("SET / RESET maintain the option map; current_setting reads back") {
    conn.queryDF("SET memory_limit = '2GB'")
    assert(conn.queryDF("SELECT current_setting('memory_limit') AS v")
      .collect().head.getString(0) === "2GB")
    conn.queryDF("SET threads TO 4")
    assert(conn.queryDF("SELECT current_setting('threads') AS v")
      .collect().head.get(0).toString === "4")
    // DuckDB-parity: RESET restores the default, the name stays readable
    conn.queryDF("RESET memory_limit")
    val back = conn.queryDF("SELECT current_setting('memory_limit') AS v")
      .collect().head.getString(0)
    assert(back === engine.defaultSettings("memory_limit"))
    conn.queryDF("RESET threads")
  }

  test("known built-in options read their defaults without a prior SET") {
    // DuckDB returns an option's default from current_setting() even when
    // it was never SET this session; only genuinely unknown names error.
    assert(conn.queryDF("SELECT current_setting('default_order') AS v")
      .collect().head.getString(0) === "asc")
    assert(conn.queryDF("SELECT current_setting('default_null_order') AS v")
      .collect().head.getString(0) === "nulls_last")
    assert(conn.queryDF("SELECT current_setting('timezone') AS v")
      .collect().head.getString(0) === "UTC")
    val ex = intercept[Exception] {
      conn.queryDF("SELECT current_setting('definitely_not_an_option')").collect()
    }
    assert(ex.getMessage.contains("unrecognized setting"))
  }

  test("RESET of an ad-hoc (no-default) option makes it unreadable again") {
    conn.queryDF("SET my_custom_flag = 'on'")
    assert(conn.queryDF("SELECT current_setting('my_custom_flag') AS v")
      .collect().head.getString(0) === "on")
    conn.queryDF("RESET my_custom_flag")
    val ex = intercept[Exception] {
      conn.queryDF("SELECT current_setting('my_custom_flag')").collect()
    }
    assert(ex.getMessage.contains("unrecognized setting"))
  }

  test("SET collapses doubled quotes: 'it''s' stores and reads back it's") {
    conn.queryDF("SET s = 'it''s'")
    assert(conn.queryDF("SELECT current_setting('s') AS v")
      .collect().head.getString(0) === "it's")
    conn.queryDF("RESET s")
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
