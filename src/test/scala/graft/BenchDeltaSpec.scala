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
}
