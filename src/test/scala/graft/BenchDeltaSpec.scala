package graft

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.Files

/** Round-10 pin of the delta-artifact self-consistency defect (r9
  * advice): n_movers was computed by a SECOND copy of the mover
  * predicate without the `t > 0` guard, so a failed query (t = −1) with
  * a positive previous time counted as a mover while being absent from
  * the deltas dict. n_movers must equal the number of "mover":true
  * entries in the same artifact, always. */
class BenchDeltaSpec extends AnyFunSuite {

  private def ms(v: Double): Double =
    BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("n_movers equals the mover entries; failed queries appear in neither") {
    val prev = Files.createTempFile("bench-prev", ".json")
    Files.writeString(prev,
      """{"metric":"total","unit":"sec","sf":"/x","samples":3,""" +
        """"spread":{"a":0.01,"b":0.01,"c":0.01},""" +
        """"queries":{"a":1.0,"b":2.0,"c":3.0},"value":6.0}""" + "\n")
    val out = Files.createTempFile("bench-delta", ".json")
    Bench.writeDelta("/x", Seq(
        ("a", 2.5, 0.02),  // ratio 2.5, beyond noise → mover
        ("b", -1.0, 0.0),  // FAILED this run → excluded everywhere
        ("c", 3.1, 0.02)), // ratio 1.03 → not a mover
      ms, prevOverride = Some(prev.toString), outPath = out.toString)
    val json = Files.readString(out)
    val movers = "\"mover\":true".r.findAllIn(json).size
    val nMovers = "\"n_movers\":(\\d+)".r.findFirstMatchIn(json).get.group(1).toInt
    assert(nMovers === movers, json)
    assert(nMovers === 1, json)
    assert(!json.contains("\"b\":{"), s"failed query must not enter the deltas: $json")
    assert("\"n_compared\":2".r.findFirstIn(json).isDefined, json)
  }

  // Round-14 (r13 verdict task 8): mover rows carry machine-readable
  // adjudication evidence — plan_changed from the canonicalized-plan
  // fingerprints and the cold/warm pair — so a latch/rider is
  // distinguishable from a real regression without manual prose.
  test("mover rows carry plan_changed and the cold/warm pair; " +
      "non-movers stay compact") {
    val prev = Files.createTempFile("bench-prev", ".json")
    Files.writeString(prev,
      """{"metric":"total","unit":"sec","sf":"/x","samples":3,""" +
        """"plans":{"a":"aaaa","c":"cccc","d":"dddd"},""" +
        """"queries_cold":{"a":1.2,"c":3.3},""" +
        """"spread":{"a":0.01,"c":0.01,"d":0.01},""" +
        """"queries":{"a":1.0,"c":3.0,"d":4.0},"value":8.0}""" + "\n")
    val out = Files.createTempFile("bench-delta", ".json")
    Bench.writeDelta("/x", Seq(
        ("a", 2.5, 0.02),  // mover: plan changed, cold pair present
        ("c", 9.0, 0.02),  // mover: plan UNCHANGED (rider/latch signature)
        ("d", 4.1, 0.02)), // not a mover → no evidence fields
      ms, prevOverride = Some(prev.toString), outPath = out.toString,
      curPlans = Map("a" -> "eeee", "c" -> "cccc", "d" -> "xxxx"),
      curCold = Map("a" -> 2.8, "c" -> 9.4))
    val json = Files.readString(out)
    val a = "\"a\":\\{[^}]*\\}".r.findFirstIn(json).get
    assert(a.contains("\"plan_changed\":true"), a)
    assert(a.contains("\"cur_cold\":2.8") && a.contains("\"prev_cold\":1.2"), a)
    val c = "\"c\":\\{[^}]*\\}".r.findFirstIn(json).get
    assert(c.contains("\"plan_changed\":false"), c)
    val d = "\"d\":\\{[^}]*\\}".r.findFirstIn(json).get
    assert(!d.contains("plan_changed") && !d.contains("cur_cold"), d)
  }

  // Round-11 pin of the contaminated-sweep defense: a would-be REGRESSION
  // mover is re-sampled once; a clean fresh sample clears the false mover
  // (the discarded latch is recorded in "resampled" ONLY — round 12: it
  // must NOT widen the reported spread, or it becomes next round's noise
  // floor and masks a genuine regression), a reproducing slow sample
  // leaves the true regression flagged, and ORDINARY improvements are
  // never re-sampled (additive noise can't fake one; latched-previous
  // improvements are the round-13 exception, tested below).
  test("reconcile: re-samples regression movers only; clean re-sample clears the latch") {
    val prevQ = Map("latched" -> 0.45, "true_reg" -> 1.0,
      "improved" -> 3.0, "steady" -> 2.0)
    val prevS = Map("latched" -> 0.01, "true_reg" -> 0.02,
      "improved" -> 0.05, "steady" -> 0.03)
    val cur = Seq(
      ("latched", 10.0, 0.0),   // early-break latch under co-tenant load
      ("true_reg", 2.4, 0.01),  // genuine 2.4× regression
      ("improved", 1.2, 0.02),  // 2.5× improvement → must NOT re-sample
      ("steady", 2.05, 0.01))   // inside the band → untouched
    val sampled = scala.collection.mutable.Buffer.empty[String]
    val (out, fresh) = Bench.reconcile(cur, Some((prevQ, prevS)), {
      case n @ "latched" => sampled += n; 0.47   // clean re-sample
      case n @ "true_reg" => sampled += n; 2.38  // reproduces
      case n => sampled += n; fail(s"re-sampled a non-regression: $n")
    })
    assert(sampled.sorted === Seq("latched", "true_reg"))
    assert(fresh === Map("latched" -> 0.47, "true_reg" -> 2.38))
    val m = out.map(r => r._1 -> r).toMap
    // latch cleared: min absorbed the fresh sample; the spread stays the
    // observed spread of the retained samples (the latch lives in
    // "resampled", never in the noise floor)
    assert(m("latched")._2 === 0.47 && m("latched")._3 === 0.0)
    assert(!Bench.isMover(m("latched")._2, prevQ("latched"),
      math.max(m("latched")._3, prevS("latched"))))
    // true regression keeps its (slightly lower) time and stays a mover
    assert(m("true_reg")._2 === 2.38)
    assert(Bench.isMover(m("true_reg")._2, prevQ("true_reg"), 0.02))
    // untouched rows pass through bit-identically
    assert(m("improved") === ("improved", 1.2, 0.02))
    assert(m("steady") === ("steady", 2.05, 0.01))
  }

  // Round-12 (ADVICE): previous-artifact selection must order rounds
  // NUMERICALLY — lexicographic name order picks r9 over r10 (and r99
  // over r100), silently feeding a stale baseline to the delta and the
  // resampling defense.
  test("loadPrev: picks the numerically newest round, not the lexicographic one") {
    val dir = java.nio.file.Files.createTempDirectory("graft-loadprev").toFile
    try {
      def write(name: String, q: Double): Unit =
        java.nio.file.Files.writeString(new java.io.File(dir, name).toPath,
          s"""{"sf":"/tmp/sfX","spread":{"a":0.01},"queries":{"a":$q}}""" + "\n")
      write("BENCH_FULL_r9.json", 9.0)    // lexicographically LAST
      write("BENCH_FULL_r10.json", 10.0)
      write("BENCH_FULL_r102.json", 102.0) // numerically newest
      val got = Bench.loadPrev("/tmp/sfX", None, dir.getPath)
      assert(got.isDefined)
      val (path, q, _) = got.get
      assert(path.endsWith("BENCH_FULL_r102.json"), path)
      assert(q === Map("a" -> 102.0))
    } finally {
      dir.listFiles().foreach(_.delete()); dir.delete()
    }
  }

  test("improvement mover with a latch-like previous spread is flagged prev_suspect") {
    // One-sided-defense closure (round-12 advice): reconcile re-verifies
    // regression movers, but a latched PREVIOUS sample reads as a big
    // improvement this round. The latch signature — previous spread ≥
    // previous minimum — marks such improvements "prev_suspect" in the
    // artifact rather than celebrating them.
    val prev = Files.createTempFile("bench-prev", ".json")
    Files.writeString(prev,
      """{"metric":"total","unit":"sec","sf":"/x","samples":3,""" +
        """"spread":{"lat":10.0,"ok":0.02},""" +
        """"queries":{"lat":9.5,"ok":3.0},"value":12.5}""" + "\n")
    val out = Files.createTempFile("bench-delta", ".json")
    Bench.writeDelta("/x", Seq(
        ("lat", 2.0, 0.05),  // big "improvement" vs a latched prev → suspect
        ("ok", 1.0, 0.02)),  // genuine improvement, tight prev spread
      ms, prevOverride = Some(prev.toString), outPath = out.toString)
    val json = Files.readString(out)
    assert(json.contains("\"lat\":{") && json.contains("\"prev_suspect\":true"), json)
    val okEntry = "\"ok\":\\{[^}]*\\}".r.findFirstIn(json).get
    assert(!okEntry.contains("prev_suspect"),
      s"genuine improvement must not be flagged: $okEntry")
  }

  // Round-13 (r12 verdict): the improvement-side latch defense is no
  // longer annotation-only — a latched-PREVIOUS improvement mover gets one
  // fresh in-process sample, and the delta entry carries it as "verify"
  // next to "prev_suspect", so the improvement claim rests on two
  // independent fast samples instead of one.
  test("latched-previous improvement is re-verified; verify lands in the delta") {
    val prevQ = Map("lat" -> 9.5, "ok" -> 3.0)
    val prevS = Map("lat" -> 10.0, "ok" -> 0.02) // lat: spread >= min = latch
    val cur = Seq(("lat", 2.0, 0.05), ("ok", 1.0, 0.02))
    val sampled = scala.collection.mutable.Buffer.empty[String]
    val (out, fresh) = Bench.reconcile(cur, Some((prevQ, prevS)), {
      case n @ "lat" => sampled += n; 1.95
      case n => fail(s"ordinary improvement must not re-sample: $n")
    })
    assert(sampled === Seq("lat"))
    assert(fresh === Map("lat" -> 1.95))
    // fresh sample folds into the minimum (it was faster)
    assert(out.find(_._1 == "lat").get._2 === 1.95)
    // ...and writeDelta carries it as "verify" on the prev_suspect row
    val prev = Files.createTempFile("bench-prev", ".json")
    Files.writeString(prev,
      """{"sf":"/x","spread":{"lat":10.0,"ok":0.02},""" +
        """"queries":{"lat":9.5,"ok":3.0}}""" + "\n")
    val outFile = Files.createTempFile("bench-delta", ".json")
    Bench.writeDelta("/x", out, ms, prevOverride = Some(prev.toString),
      outPath = outFile.toString, resampled = fresh)
    val json = Files.readString(outFile)
    val latEntry = "\"lat\":\\{[^}]*\\}".r.findFirstIn(json).get
    assert(latEntry.contains("\"prev_suspect\":true") &&
      latEntry.contains("\"verify\":1.95"), latEntry)
    val okEntry = "\"ok\":\\{[^}]*\\}".r.findFirstIn(json).get
    assert(!okEntry.contains("verify"), okEntry)
  }

  // Round-13: a bad host window (control-query ratio outside [1/1.4, 1.4]
  // vs the previous artifact) suppresses every mover flag — movers
  // measured through a shifted window are noise (the r12 sf1 re-measure's
  // 8 phantom movers), and the artifact says so explicitly.
  test("host-unhealthy window suppresses mover flags and stamps the artifact") {
    val prev = Files.createTempFile("bench-prev", ".json")
    Files.writeString(prev,
      """{"sf":"/x","spread":{"a":0.01,"b":0.01},""" +
        """"queries":{"a":1.0,"b":2.0}}""" + "\n")
    def run(health: Option[Double]): String = {
      val out = Files.createTempFile("bench-delta", ".json")
      Bench.writeDelta("/x", Seq(("a", 2.5, 0.02), ("b", 2.1, 0.02)),
        ms, prevOverride = Some(prev.toString), outPath = out.toString,
        hostHealth = health)
      Files.readString(out)
    }
    val bad = run(Some(2.1))
    assert(bad.contains("\"host_unhealthy\":true") &&
      bad.contains("\"host_health\":2.1"), bad)
    assert(!bad.contains("\"mover\":true") &&
      bad.contains("\"n_movers\":0"), bad)
    val good = run(Some(1.05))
    assert(good.contains("\"host_unhealthy\":false"), good)
    assert(good.contains("\"mover\":true"), good) // a is a real 2.5x mover
    val noHealth = run(None) // no controls matched → no gate, no stamp
    assert(!noHealth.contains("host_unhealthy") &&
      noHealth.contains("\"mover\":true"), noHealth)
  }

  // Round-15 (r14 verdict task 2): rows the previous artifact measured
  // at/above the 10 s early-break always take ≥2 samples — one co-tenant
  // burst sample must never be the committed number (r14: p08 committed
  // 64.5 s where a same-day sweep of identical code measured 19.3 s).
  test("heavyMinSamples: known-heavy rows take >=2 samples, others 1") {
    assert(Bench.heavyMinSamples(Some(25.0), 3) === 2)
    assert(Bench.heavyMinSamples(Some(10.0), 3) === 2) // at the cutoff
    assert(Bench.heavyMinSamples(Some(3.0), 3) === 1) // known light
    assert(Bench.heavyMinSamples(None, 3) === 1) // unknown row
    assert(Bench.heavyMinSamples(Some(25.0), 1) === 1) // capped by samples
  }

  test("reconcile: failed re-sample and missing prev change nothing") {
    val cur = Seq(("a", 5.0, 0.1))
    val (noPrev, f1) = Bench.reconcile(cur, None, _ => fail("no prev → no sampling"))
    assert(noPrev === cur && f1.isEmpty)
    val (failedSample, f2) =
      Bench.reconcile(cur, Some((Map("a" -> 1.0), Map.empty)), _ => -1.0)
    assert(failedSample === cur, "a failed re-sample must keep the original")
    assert(f2 === Map("a" -> -1.0))
  }
}
