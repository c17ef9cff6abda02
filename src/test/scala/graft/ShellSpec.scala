package graft

import graft.session.{Engine, EngineConfig}
import org.scalatest.funsuite.AnyFunSuite

/** One spec per shell dot-command — the parity set is the reference REPL's
  * dispatch table (packages/duckdb-wasm-shell/crate/src/shell.rs:489-554:
  * .clear/.help/.reset/.features/.timer/.fstats{collect,disable,paging,
  * reads,reset}/.open/.files), plus the engine's own .tables/.quit
  * additions. Commands are driven through Shell.dotCommand with stdout
  * captured; the REPL loop itself is stdin plumbing and is not under test.
  */
class ShellSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private def engine = new Engine(EngineConfig(existingSession = Some(spark)))

  private def run(e: Engine, cmd: String,
      setTimer: Boolean => Unit = _ => (), timer: Boolean = false): String = {
    val bout = new java.io.ByteArrayOutputStream()
    Console.withOut(new java.io.PrintStream(bout, true, "UTF-8")) {
      Shell.dotCommand(e, cmd, setTimer, timer)
    }
    bout.toString("UTF-8")
  }

  test(".help lists the reference command set") {
    val out = run(engine, ".help")
    for (c <- Seq(".clear", ".features", ".files", ".fstats collect",
        ".fstats disable", ".fstats paging", ".fstats reads", ".fstats reset",
        ".open", ".reset", ".timer", ".tables", ".quit"))
      assert(out.contains(c), s"help is missing $c:\n$out")
  }

  test(".timer on/off flips the flag; bad usage reports") {
    var t = false
    assert(run(engine, ".timer on", v => t = v).contains("Timer enabled") && t)
    assert(run(engine, ".timer off", v => t = v).contains("Timer disabled") && !t)
    assert(run(engine, ".timer banana").contains("Usage"))
  }

  test(".features prints the engine feature flags") {
    val e = engine
    val out = run(e, ".features")
    e.getFeatureFlags.keys.foreach(k => assert(out.contains(k)))
  }

  test(".files lists registered files; empty registry says so") {
    val e = engine
    assert(run(e, ".files").contains("(no registered files)"))
    e.files.registerFilePath("shellspec.parquet", s"$sfDir/region.parquet")
    assert(run(e, ".files").contains("shellspec.parquet"))
    e.files.dropFile("shellspec.parquet")
  }

  test(".tables lists catalog tables") {
    val e = engine
    e.connect().query("CREATE OR REPLACE TEMP VIEW shell_t AS SELECT 1 AS x")
    assert(run(e, ".tables").contains("shell_t"))
  }

  test(".open registers every parquet in a directory as a table") {
    val e = engine
    val out = run(e, s".open $sfDir")
    assert(out.contains("opened table: region"))
    assert(out.contains("opened table: nation"))
    assert(e.connect().queryDF("SELECT count(*) n FROM region")
      .collect().head.getLong(0) === 5L)
    assert(run(e, ".open").contains("Usage"))
  }

  test(".fstats collect/reads/disable over a registered file") {
    val e = engine
    e.files.registerFilePath("shellstats.parquet", s"$sfDir/region.parquet")
    assert(run(e, ".fstats collect shellstats.parquet").contains(
      "Collecting file statistics for: shellstats.parquet"))
    e.files.copyFileToBuffer("shellstats.parquet")
    val reads = run(e, ".fstats reads shellstats.parquet")
    assert(reads.contains("shellstats.parquet"))
    assert(run(e, ".fstats disable shellstats.parquet").contains(
      "Disabled file statistics"))
    assert(run(e, ".fstats").contains("Usage"))
    e.files.dropFile("shellstats.parquet")
  }

  test(".fstats paging shows block loads/accesses; reset zeroes them") {
    val e = engine
    e.files.registerFilePath("shellpage.parquet", s"$sfDir/region.parquet")
    e.files.collectFileStatistics("shellpage.parquet", enable = true)
    // copyFileToBuffer reads through the registry API → block counters
    e.files.copyFileToBuffer("shellpage.parquet")
    val paging = run(e, ".fstats paging shellpage.parquet")
    assert(paging.contains("loads") && paging.contains("accesses"),
      s"paging header missing:\n$paging")
    assert(paging.contains("total"))
    // reset keeps collection armed but zeroes every counter
    val reset = run(e, ".fstats reset shellpage.parquet")
    assert(reset.contains("Resetted file statistics for: shellpage.parquet"))
    val st = e.files.exportFileStatistics("shellpage.parquet")
    assert(st.apiReads === 0L && st.scanResolutions === 0L)
    assert(run(e, ".fstats paging shellpage.parquet")
      .contains("(no block reads recorded)"))
    // still armed: a new read repopulates
    e.files.copyFileToBuffer("shellpage.parquet")
    assert(e.files.exportFileStatistics("shellpage.parquet").apiReads === 1L)
    e.files.collectFileStatistics("shellpage.parquet", enable = false)
    e.files.dropFile("shellpage.parquet")
  }

  test(".reset resets the engine; unknown commands report") {
    val e = engine
    assert(run(e, ".reset").contains("Engine reset"))
    assert(run(e, ".bogus").contains("unknown command: .bogus"))
  }
}
