package graft

import graft.session.{Engine, EngineConfig}
import scala.io.StdIn

/** Interactive SQL shell — the JVM analog of the reference's xterm REPL
  * (packages/duckdb-wasm-shell/crate/src/shell.rs:480-560): SQL statements
  * execute through a Connection, dot-commands mirror the reference set
  * (.help/.timer/.files/.fstats/.open/.reset/.clear/.features).
  *
  * Run: sbt "runMain graft.Shell" — reads stdin until EOF or .quit.
  */
object Shell {
  def main(args: Array[String]): Unit = {
    val engine = new Engine(EngineConfig())
    val conn = engine.connect()
    var timer = false
    println(s"graft shell — ${engine.getVersion}. Type .help for commands.")

    var line = StdIn.readLine("graft> ")
    while (line != null && line.trim != ".quit" && line.trim != ".exit") {
      val text = line.trim
      try {
        if (text.isEmpty) ()
        else if (text.startsWith(".")) dotCommand(engine, text, t => timer = t, timer)
        else {
          val t0 = System.nanoTime()
          val df = conn.queryDF(text)
          df.show(50, truncate = false)
          if (timer)
            println(f"elapsed: ${(System.nanoTime() - t0) / 1e9}%.3f s")
        }
      } catch {
        case e: Throwable =>
          println("error: " + Option(e.getMessage).getOrElse(e.toString)
            .linesIterator.take(3).mkString(" | "))
      }
      line = StdIn.readLine("graft> ")
    }
    engine.close()
  }

  /** Package-visible for ShellSpec: each dot-command is driven directly
    * (the REPL loop itself is stdin plumbing). */
  private[graft] def dotCommand(engine: Engine, text: String,
      setTimer: Boolean => Unit, timer: Boolean): Unit = {
    val parts = text.split("\\s+", 3)
    parts(0) match {
      case ".help" => println(
        """Commands:
          |.clear                 Clear the shell.
          |.features              Shell features.
          |.files                 List registered files.
          |.fstats collect $FILE  Collect file statistics.
          |.fstats disable $FILE  Disable file statistics.
          |.fstats paging $FILE   Show file paging.
          |.fstats reads $FILE    Show file reads.
          |.fstats reset $FILE    Reset file statistics.
          |.open $DIR             Open a directory of parquet files.
          |.reset                 Reset the engine.
          |.tables                List tables.
          |.timer on|off          Turn query timer on or off.
          |.quit                  Exit.""".stripMargin)
      case ".clear" => print("[2J[H")
      case ".features" =>
        engine.getFeatureFlags.toSeq.sortBy(_._1)
          .foreach { case (k, v) => println(s"$k: $v") }
      case ".files" =>
        engine.files.globFiles("*") match {
          case Nil => println("(no registered files)")
          case fs => fs.foreach(println)
        }
      case ".tables" =>
        val c = engine.connect()
        try c.queryDF("PRAGMA show_tables")
          .collect().foreach(r => println(r.getString(0)))
        finally c.close()
      case ".timer" =>
        parts.lift(1) match {
          case Some("on") => setTimer(true); println("Timer enabled")
          case Some("off") => setTimer(false); println("Timer disabled")
          case _ => println("Usage: .timer [on/off]")
        }
      case ".fstats" =>
        (parts.lift(1), parts.lift(2)) match {
          case (Some("collect"), Some(f)) =>
            engine.files.collectFileStatistics(f, enable = true)
            println(s"Collecting file statistics for: $f")
          case (Some("disable"), Some(f)) =>
            engine.files.collectFileStatistics(f, enable = false)
            println(s"Disabled file statistics for: $f")
          case (Some("reads"), Some(f)) =>
            println(engine.files.exportFileStatistics(f))
          case (Some("paging"), Some(f)) =>
            // paging view (reference print_page_stats): per touched block,
            // loads = first materializations (cold + read-ahead), accesses =
            // every touch — for a non-caching FS each cold/ahead read IS a
            // page load; cached reads are accesses without loads
            val st = engine.files.exportFileStatistics(f)
            val touched = st.blocks.filter(b =>
              b.coldReads + b.aheadReads + b.cachedReads > 0)
            if (touched.isEmpty) println("(no block reads recorded)")
            else {
              println(f"${"block"}%8s ${"loads"}%8s ${"accesses"}%8s  (block size = ${1L << st.blockShift} B)")
              touched.foreach { b =>
                val loads = b.coldReads + b.aheadReads
                val acc = loads + b.cachedReads
                println(f"${b.blockIdx}%8d $loads%8d $acc%8d")
              }
              val totLoads = touched.map(b => b.coldReads + b.aheadReads).sum
              val totAcc = totLoads + touched.map(_.cachedReads).sum
              println(f"${"total"}%8s $totLoads%8d $totAcc%8d")
            }
          case (Some("reset"), Some(f)) =>
            engine.files.resetFileStatistics(f)
            println(s"Resetted file statistics for: $f") // reference spelling
          case _ =>
            println("Usage: .fstats [collect|disable|paging|reads|reset] $FILE")
        }
      case ".open" =>
        parts.lift(1) match {
          case Some(dir) =>
            val d = new java.io.File(dir)
            Option(d.listFiles()).getOrElse(Array.empty)
              .filter(_.getName.endsWith(".parquet"))
              .foreach { f =>
                val name = f.getName.stripSuffix(".parquet")
                try {
                  graft.Tables.readParquetAuto(engine.spark, f.getPath)
                    .createOrReplaceTempView(name)
                  println(s"opened table: $name")
                } catch { case e: Exception =>
                  println(s"failed to open $name: " +
                    Option(e.getMessage).getOrElse("").linesIterator.take(1).mkString)
                }
              }
          case None => println("Usage: .open $DIR")
        }
      case ".reset" => engine.reset(); println("Engine reset")
      case other => println(s"unknown command: $other (try .help)")
    }
  }
}
