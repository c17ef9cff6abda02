package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Plain CAST(e AS BOOLEAN) with DuckDB's strict VARCHAR set (round-13
  * grid follow-up): {true, false, t, f, 1, 0} case-insensitively, NO
  * trimming — everything else errors LOUDLY with DuckDB's message text,
  * where Spark's ANSI cast silently accepted y/yes/n/no and trimmed
  * whitespace (value-vs-error divergence). Routed by the parse-level hook
  * so only the engine SQL path changes. */
class CastBoolSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  private def one(sql: String): Any = conn.queryDF(sql).collect().head.get(0)

  test("accepted strings: true/false/t/f/1/0, case-insensitive, untrimmed") {
    assert(one("SELECT CAST('true' AS BOOLEAN)") === true)
    assert(one("SELECT CAST('False' AS BOOLEAN)") === false)
    assert(one("SELECT CAST('T' AS BOOLEAN)") === true)
    assert(one("SELECT CAST('f' AS BOOLEAN)") === false)
    assert(one("SELECT CAST('1' AS BOOLEAN)") === true)
    assert(one("SELECT CAST('0' AS BOOLEAN)") === false)
    assert(one("SELECT CAST(NULL AS BOOLEAN)") == null)
    assert(one("SELECT '1'::BOOLEAN") === true) // ::BOOLEAN, same hook
  }

  test("rejected strings error loudly with DuckDB's message") {
    for (bad <- Seq("yes", "no", "y", "n", "on", "off", " true ")) {
      val ex = intercept[Exception] {
        conn.queryDF(s"SELECT CAST('$bad' AS BOOLEAN)").collect()
      }
      def msgs(t: Throwable): Seq[String] =
        if (t == null) Nil else String.valueOf(t.getMessage) +: msgs(t.getCause)
      assert(msgs(ex).exists(_.contains("to BOOL")),
        s"'$bad' → ${ex.getMessage.take(150)}")
    }
    val ex2 = intercept[Exception] {
      conn.queryDF("SELECT 'yes'::BOOLEAN").collect()
    }
    assert(ex2.getMessage.contains("to BOOL") ||
      String.valueOf(ex2.getCause).contains("to BOOL"))
  }

  test("non-string operands keep Spark's cast; TRY stays NULL-quiet") {
    assert(one("SELECT CAST(1 AS BOOLEAN)") === true)
    assert(one("SELECT CAST(0 AS BOOLEAN)") === false)
    assert(one("SELECT CAST(true AS BOOLEAN)") === true)
    assert(one("SELECT TRY_CAST('yes' AS BOOLEAN)") == null)
    assert(one("SELECT TRY_CAST('t' AS BOOLEAN)") === true)
  }
}
