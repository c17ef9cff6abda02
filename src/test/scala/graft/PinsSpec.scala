package graft

import org.apache.spark.storage.StorageLevel
import org.scalatest.funsuite.AnyFunSuite

/** The pin registry's lifetime contract directly (the harness behavior the
  * bench/verify wall-clock and the warm-reporting honesty depend on):
  * ephemeral pins drop at the query boundary, shared stages survive until
  * releaseAll, the memo never rebuilds a live entry, warm tracking only
  * counts hits AFTER a query boundary, and an externally-unpersisted
  * shared stage re-pins lazily. */
class PinsSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import graft.pipeline.Pins

  test("ephemeral pins release at the query boundary; shared stages survive") {
    val e = Pins.ephemeral(spark.range(100).toDF("v"))
    assert(e.storageLevel != StorageLevel.NONE)
    val sh = Pins.shared(spark, "/tmp/pins-spec", "stage-a")(spark.range(10).toDF("s"))
    assert(sh.storageLevel != StorageLevel.NONE)
    Pins.releaseEphemeral(spark)
    assert(e.storageLevel == StorageLevel.NONE, "ephemeral must drop per query")
    assert(sh.storageLevel != StorageLevel.NONE, "shared survives the per-query release")
    Pins.releaseAll(spark)
    assert(sh.storageLevel == StorageLevel.NONE, "releaseAll drops shared stages")
  }

  test("shared memo returns the live entry and rebuilds only after releaseAll") {
    var builds = 0
    def build = { builds += 1; spark.range(7).toDF("x") }
    val first = Pins.shared(spark, "/tmp/pins-spec", "stage-b")(build)
    val second = Pins.shared(spark, "/tmp/pins-spec", "stage-b")(build)
    assert(builds === 1 && (second eq first))
    Pins.releaseAll(spark)
    Pins.shared(spark, "/tmp/pins-spec", "stage-b")(build)
    assert(builds === 2, "a released key rebuilds on next access")
    Pins.releaseAll(spark)
  }

  test("warm tracking counts only hits after a query boundary") {
    Pins.releaseAll(spark)
    Pins.resetWarmTracking(spark)
    val key = ("/tmp/pins-spec", "stage-c")
    Pins.shared(spark, key._1, key._2)(spark.range(3).toDF("w"))
    // same-query re-access: the stage was built THIS query → not warm yet
    Pins.shared(spark, key._1, key._2)(fail("must not rebuild"))
    assert(!Pins.warmKeys(spark).contains(key))
    Pins.releaseEphemeral(spark) // the query boundary
    Pins.resetWarmTracking(spark)
    Pins.shared(spark, key._1, key._2)(fail("must not rebuild"))
    assert(Pins.warmKeys(spark).contains(key),
      "a stage built by an earlier query reports warm")
    Pins.releaseAll(spark)
  }

  test("purge (the onApplicationEnd listener path) drops the session's whole registry eagerly") {
    var builds = 0
    def build = { builds += 1; spark.range(9).toDF("p") }
    val sh = Pins.shared(spark, "/tmp/pins-spec", "stage-e")(build)
    val e = Pins.ephemeral(spark.range(4).toDF("q"))
    assert(builds === 1)
    Pins.purge(spark) // what the SparkListener invokes at application end
    assert(sh.storageLevel == StorageLevel.NONE, "purge unpersists shared stages")
    assert(e.storageLevel == StorageLevel.NONE, "purge unpersists ephemeral pins")
    Pins.shared(spark, "/tmp/pins-spec", "stage-e")(build)
    assert(builds === 2, "a purged session starts from an empty registry")
    assert(!Pins.warmKeys(spark).contains(("/tmp/pins-spec", "stage-e")),
      "warm tracking must not survive a purge")
    Pins.releaseAll(spark)
  }

  test("an externally-unpersisted shared stage re-pins lazily on next access") {
    val sh = Pins.shared(spark, "/tmp/pins-spec", "stage-d")(spark.range(5).toDF("a"))
    sh.unpersist(blocking = true) // e.g. a user-level clearCache
    assert(sh.storageLevel == StorageLevel.NONE)
    val again = Pins.shared(spark, "/tmp/pins-spec", "stage-d")(fail("must not rebuild"))
    assert((again eq sh) && again.storageLevel != StorageLevel.NONE,
      "the memoized frame re-persists instead of rebuilding")
    Pins.releaseAll(spark)
  }
}
