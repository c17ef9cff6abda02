package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** Differential-probing wave 3 (round 13) as a REPEATABLE grid: every line
  * of src/test/resources/probe_grid.tsv is a scalar expression whose value
  * was pinned by python-duckdb 1.0.0 (scripts/probe_grid.py — the driver's
  * oracle engine); this spec replays each through the engine's SQL path
  * and compares the normalized value. A failing line is a FOUND
  * DIVERGENCE: fix it or move it to `knownDivergences` with the COVERAGE
  * boundary that documents it — never delete the probe. */
class ProbeGridSpec extends AnyFunSuite {

  private lazy val engine =
    new Engine(EngineConfig(existingSession = Some(SparkTestSession.spark)))
  private lazy val conn = engine.connect()

  /** sql → short reason; each must correspond to a documented boundary.
    * Round 14 closed every formerly pinned divergence: upper('straße')
    * (graft_upper simple mapping), DATE−DATE (graft_sub BIGINT days),
    * and EXTRACT of a coarser field from a narrow interval
    * (graft_datepart component kernels). */
  private val knownDivergences: Map[String, String] = Map.empty

  /** Mirror of probe_grid.py's norm(). */
  private def norm(v: Any): String = v match {
    case null => "NULL"
    case b: Boolean => if (b) "true" else "false"
    case d: Double => normDouble(d)
    case f: Float => normDouble(f.toDouble)
    case d: java.math.BigDecimal => normDouble(d.doubleValue)
    case d: BigDecimal => normDouble(d.toDouble)
    case t: java.sql.Timestamp =>
      new java.text.SimpleDateFormat("yyyy-MM-dd HH:mm:ss").format(t)
    case t: java.time.LocalDateTime =>
      t.format(java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss"))
    case d: java.sql.Date => d.toString
    case d: java.time.LocalDate => d.toString
    case s: scala.collection.Seq[_] => s.map(norm).mkString("[", ", ", "]")
    case other => other.toString
  }

  private def normDouble(d: Double): String = {
    if (d.isNaN) return "NaN"
    if (d.isInfinity) return if (d > 0) "Infinity" else "-Infinity"
    val s = BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_EVEN)
      .bigDecimal.toPlainString.reverse.dropWhile(_ == '0').reverse
      .stripSuffix(".")
    if (s.isEmpty || s == "-0") "0" else s
  }

  private lazy val probes: Seq[(String, String, String)] = {
    val in = getClass.getResourceAsStream("/probe_grid.tsv")
    assert(in != null, "probe_grid.tsv missing from test resources")
    scala.io.Source.fromInputStream(in, "UTF-8").getLines()
      .filterNot(l => l.startsWith("#") || l.trim.isEmpty)
      .map { l => val a = l.split("\t", 3); (a(0), a(1), a(2)) }
      .toSeq
  }

  test("all probe-grid expressions match the pinned duckdb values") {
    val failures = scala.collection.mutable.Buffer.empty[String]
    var known = 0
    for ((cat, sql, expected) <- probes) {
      if (knownDivergences.contains(sql)) known += 1
      else {
        val got = scala.util.Try(
          norm(conn.queryDF(s"SELECT ($sql) AS v").collect().head.get(0)))
        got match {
          case scala.util.Success(g) if g == expected => // parity
          case scala.util.Success(g) =>
            failures += s"[$cat] $sql → engine=$g duckdb=$expected"
          case scala.util.Failure(e) =>
            failures += s"[$cat] $sql → engine ERROR ${e.getMessage.takeWhile(_ != '\n').take(110)} duckdb=$expected"
        }
      }
    }
    assert(failures.isEmpty,
      s"\n${failures.size} divergence(s) of ${probes.size} probes " +
        s"($known known):\n${failures.mkString("\n")}")
  }
}
