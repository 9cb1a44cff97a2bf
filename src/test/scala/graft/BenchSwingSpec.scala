package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact's prior-round memory: parse last run's per-query
  * times (full map, or a truncated driver-capture tail), gate on scale
  * factor, and classify a >2x swing as environmental noise vs a real
  * regression — so a host-noise window (r10's q139 shipping 10 s that
  * re-measured 3.9 s) can never read as a silent regression, and a real
  * regression can never hide as assumed noise. */
class BenchSwingSpec extends AnyFunSuite {

  private val fullBody =
    """{"metric":"total","value":147.541,"unit":"sec","sf":"/root/testdata/sf0.1",""" +
    """"queries":{"q01_pricing_summary":{"t":0.414,"gc_ms":0,"heap_mb":70},""" +
    """"q139_triangle_census":{"t":3.933,"gc_ms":28,"heap_mb":83}}}"""

  test("parsePriorFull reads full-name times when sf matches") {
    val m = Bench.parsePriorFull(fullBody, "/root/testdata/sf0.1")
    assert(m == Map("q01_pricing_summary" -> 0.414, "q139_triangle_census" -> 3.933))
  }

  test("parsePriorFull rejects a prior taken at a different scale factor") {
    assert(Bench.parsePriorFull(fullBody, "/root/testdata/sf0.01").isEmpty)
    assert(Bench.parsePriorFull("", "/root/testdata/sf0.1").isEmpty)
  }

  test("parsePriorFull matches sf by tag when the prior ran from a different root") {
    val moved = fullBody.replace("/root/testdata/sf0.1", "/mnt/data/sf0.1")
    assert(Bench.parsePriorFull(moved, "/root/testdata/sf0.1").nonEmpty)
  }

  test("parsePriorTail reads the real artifact shape: tail is a JSON string with escaped quotes") {
    // verbatim prefix shape of BENCH_r11.json: the "tail" field is a
    // JSON string, so every quote inside it is backslash-escaped
    val art = "{\n  \"n\": 11,\n  \"rc\": 0,\n  \"sf\": 0.1,\n  \"tail\": " +
      "\"\\\"q108\\\":2.384,\\\"q109\\\":1.358,\\\"q10\\\":1.083,\\\"q139\\\":9.969,\\\"q11"
    val m = Bench.parsePriorTail(art, "/root/testdata/sf0.1")
    assert(m("q139") == 9.969 && m("q10") == 1.083 && m("q108") == 2.384)
    assert(!m.contains("q11"), "the cut-off pair must not produce a bogus entry")
  }

  test("parsePriorTail also salvages a bare (unescaped) stdout capture") {
    val tail = """"sf": 0.1, "tail": ","q108":2.384,"q109":1.358,"q10":1.083,"q139":9.969,"q11"""
    val m = Bench.parsePriorTail(tail, "/root/testdata/sf0.1")
    assert(m("q139") == 9.969 && m("q10") == 1.083 && m("q108") == 2.384)
    assert(!m.contains("q11"), "the cut-off pair must not produce a bogus entry")
  }

  test("parsePriorTail gates on the bare-number sf (0.1 prior never compares to 0.01 run)") {
    val tail = """"sf": 0.1, "q139":9.969"""
    assert(Bench.parsePriorTail(tail, "/root/testdata/sf0.01").isEmpty)
  }

  test("parsePriorTail sf gate anchors the digits: a 0.15 prior never drives a 0.1 run") {
    val tail = """"sf": 0.15, "tail": "\"q139\":9.969""""
    assert(Bench.parsePriorTail(tail, "/root/testdata/sf0.1").isEmpty)
    assert(Bench.parsePriorTail(""""sf": 0.125, "q139":9.969""",
      "/root/testdata/sf0.1").isEmpty)
  }

  test("swing verdicts: rerun inside 2x prior is noise; both runs slow is a regression") {
    assert(Bench.swingVerdict(9.97, 3.29, 3.74) == "noise")     // r10's q139
    assert(Bench.swingVerdict(9.97, 9.80, 3.74) == "regression") // real plan change
    assert(Bench.swingVerdict(9.97, -1.0, 3.74) == "regression") // rerun errored: t1 rules
    assert(Bench.swingVerdict(7.40, 8.10, 3.74) == "noise")      // t1 itself within 2x
  }
}
