package graft

import org.scalatest.funsuite.AnyFunSuite

/** SharedStages: the bench's pre-sweep stage prebuild (round 16) must
  * (a) cover EXACTLY the `Pins.shared` call-site inventory — a stage
  * added without a prebuild entry silently reintroduces the
  * order-dependent warm minima the prebuild exists to kill — and
  * (b) actually leave every stage warm for subsequent consumers. */
class SharedStagesSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  test("prebuild inventory matches the Pins.shared call sites in src/main") {
    val declared = graft.pipeline.SharedStages.all(spark, sfDir).map(_._1).toSet
    // scan the main tree for Pins.shared(s, dir, "<kind>") literals
    val kindRe = """Pins\.shared\([^,]+,\s*[^,]+,\s*"([^"]+)"""".r
    def scan(dir: java.io.File): Seq[String] =
      dir.listFiles.toSeq.flatMap { f =>
        if (f.isDirectory) scan(f)
        else if (f.getName.endsWith(".scala")) {
          val src = new String(
            java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
          kindRe.findAllMatchIn(src).map(_.group(1)).toSeq
        } else Nil
      }
    val inSource = scan(new java.io.File("src/main/scala/graft")).toSet
    assert(inSource.nonEmpty, "source scan found no Pins.shared call sites")
    assert(declared === inSource,
      s"SharedStages.all out of sync: declared $declared vs source $inSource")
  }

  test("prebuild materializes every stage and consumers ride warm") {
    graft.pipeline.Pins.releaseAll(spark)
    val built = graft.pipeline.SharedStages.prebuild(spark, sfDir)
    assert(built.forall(_._2 >= 0.0),
      s"stage build failed: ${built.filter(_._2 < 0)}")
    // mark the prebuild as "query zero", as the bench does
    graft.pipeline.Pins.releaseEphemeral(spark)
    graft.pipeline.Pins.resetWarmTracking(spark)
    // a signature-family consumer must now register a warm hit
    SparkEntry.queries("p06_minhash_lsh_pairs")(spark, sfDir).collect()
    assert(graft.pipeline.Pins.warmKeys(spark).nonEmpty,
      "consumer after prebuild must report a warm shared stage")
    graft.pipeline.Pins.releaseAll(spark)
  }
}
