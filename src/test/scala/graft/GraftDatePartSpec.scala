package graft

import org.scalatest.funsuite.AnyFunSuite

/** date_part/extract over INTERVAL values (functions/GraftDatePart.scala).
  * The YM/DT branches are pinned by 20 probe-grid rows and oracle q128;
  * this spec covers what the grid cannot reach: the CalendarIntervalType
  * branch (make_interval has no DuckDB twin — expectations composed from
  * the probed per-component semantics), DuckDB's loud unit rejection, and
  * the epoch() spelling over intervals. Engine path via queryDF. */
class GraftDatePartSpec extends AnyFunSuite {
  import SparkTestSession.spark

  private lazy val engine = new session.Engine(
    session.EngineConfig(existingSession = Some(spark)))
  private lazy val conn = engine.connect()

  private def one(sql: String): Any =
    conn.queryDF(s"SELECT ($sql) AS v").collect().head.get(0)

  test("CalendarInterval (make_interval) extracts all three components") {
    // months=14, days=3, micros = 26h + 90m + 1.5s = 27h30m1.5s
    val iv = "make_interval(1, 2, 0, 3, 26, 90, 1.5)"
    assert(one(s"date_part('year', $iv)") === 1L)
    assert(one(s"date_part('month', $iv)") === 2L)
    assert(one(s"date_part('day', $iv)") === 3L)
    assert(one(s"date_part('hour', $iv)") === 27L)   // hours unbounded
    assert(one(s"date_part('minute', $iv)") === 30L)
    assert(one(s"date_part('second', $iv)") === 1L)  // truncates, in-minute
    assert(one(s"date_part('ms', $iv)") === 1500L)
    // epoch: 365.25-day years + 30-day month remainder + days + micros
    // = 31557600 + 2*2592000 + 3*86400 + 99001.5
    assert(one(s"date_part('epoch', $iv)") === 36741600.0 + 259200.0 + 99001.5)
  }

  test("unsupported interval units reject loudly like DuckDB") {
    for (f <- Seq("week", "doy", "era", "isoyear")) {
      val ex = intercept[Exception](one(s"date_part('$f', INTERVAL 26 HOUR)"))
      assert(ex.getMessage.contains("not recognized"), s"$f: ${ex.getMessage}")
    }
    // dow/isodow are text-rewritten to dayofweek/weekday arithmetic
    // before the marker — still a loud analysis error on intervals
    for (f <- Seq("dow", "isodow"))
      intercept[Exception](one(s"date_part('$f', INTERVAL 26 HOUR)"))
  }

  test("epoch() spelling dispatches intervals to the component kernels") {
    assert(one("epoch(INTERVAL 2 DAY)") === 172800.0)
    assert(one("epoch(INTERVAL 14 MONTH)") === 36741600.0)
    // the moved rewrite keeps date/timestamp parity
    assert(one("epoch(TIMESTAMP '1970-01-01 00:00:01.5')") === 1.5)
  }
}
