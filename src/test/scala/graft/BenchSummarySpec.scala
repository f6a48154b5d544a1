package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench artifact contract (`Bench.summaryJson`): a planted failure
  * must be visible IN the artifact by name, the -1.0 sentinel must stay
  * out of the total, and the headline comparables must sit at the END of
  * the line so the driver's stdout-tail capture keeps them. */
class BenchSummarySpec extends AnyFunSuite {

  private val results = Seq(
    "q_ok" -> ((0.5, 0.4)),
    "q_flaky" -> ((-1.0, 2.0)), // one failed pass: best = the good pass
    "q_dead" -> ((-1.0, -1.0))) // both passes failed

  test("planted failure appears by name; sentinel stays out of the total") {
    val s = Bench.summaryJson(results, leaked = 0, sfDir = "/x/sf")
    assert(s.contains(""""failed":["q_dead"]"""), s)
    assert(s.contains(""""failed_queries":1"""), s)
    // total = 0.4 (q_ok min) + 2.0 (q_flaky surviving pass); q_dead excluded
    assert(s.contains(""""value":2.4"""), s)
    assert(s.contains(""""q_flaky":2.0"""), s)
  }

  test("headline fields trail the line so a stdout-tail capture keeps them") {
    val s = Bench.summaryJson(results, leaked = 0, sfDir = "/x/sf")
    val tail = s.takeRight(200)
    Seq("\"metric\":\"total\"", "\"value\":", "\"failed\":", "\"leaked_persists\":",
        "\"sf\":").foreach(f => assert(tail.contains(f), s"$f not in tail: $tail"))
    assert(s.indexOf("\"queries\":") < s.indexOf("\"metric\":"), s)
  }

  test("clean run reports an empty failure list") {
    val s = Bench.summaryJson(Seq("a" -> ((1.0, 2.0))), leaked = 0, sfDir = "d")
    assert(s.contains(""""failed":[]""") && s.contains(""""failed_queries":0"""), s)
    assert(s.contains(""""value":1.0"""), s)
  }

  test("driver-tail contract survives 300+ queries: headline fields stay in the last 300 chars") {
    // the driver's BENCH_r{N}.json keeps only the stdout TAIL; the bulky
    // per-query maps grow with every round, so the contract that the
    // headline comparables sit at the very END must hold at ANY query
    // count — pinned here at 320 queries (more than double the current
    // ledger) with failures and load present, so future growth cannot
    // silently push "value"/"failed"/"leaked_persists" out of the
    // driver's capture window
    val many = (0 until 320).map(i => s"q_$i" -> ((0.1 + i * 0.01, 0.2 + i * 0.01))) ++
      Seq("q_dead_tail" -> ((-1.0, -1.0)))
    val s = Bench.summaryJson(many, leaked = 2, sfDir = "/x/sf",
      loadAvg = Seq(1.0, 2.0, 3.0))
    val tail = s.takeRight(300)
    Seq("\"value\":", "\"failed\":", "\"leaked_persists\":").foreach(f =>
      assert(tail.contains(f), s"$f not in last-300 tail: $tail"))
    assert(tail.contains("q_dead_tail"),
      "the failed-query NAME must survive the tail capture too")
  }

  test("host load average rides in the artifact; headline still trails it") {
    val s = Bench.summaryJson(Seq("a" -> ((1.0, 2.0))), leaked = 0, sfDir = "d",
      loadAvg = Seq(1.5, 2.25, 3.0))
    assert(s.contains(""""loadavg":[1.5,2.25,3.0]"""), s)
    assert(s.indexOf("\"loadavg\":") < s.indexOf("\"metric\":"), s)
    // absent on platforms without /proc: emitted as an empty array, valid JSON
    val none = Bench.summaryJson(Seq("a" -> ((1.0, 2.0))), leaked = 0, sfDir = "d")
    assert(none.contains(""""loadavg":[]"""), none)
  }

  test("previous committed total + its loadavg ride as reference fields") {
    val s = Bench.summaryJson(Seq("a" -> ((1.0, 2.0))), leaked = 0, sfDir = "d",
      loadAvg = Seq(0.5, 0.4, 0.3),
      reference = Some((61.9, Seq(0.48, 0.6, 0.7))))
    assert(s.contains(""""reference_quiet_total":61.9"""), s)
    assert(s.contains(""""reference_loadavg":[0.48,0.6,0.7]"""), s)
    // still valid JSON with the headline trailing (driver-tail contract)
    assert(s.indexOf("\"reference_quiet_total\":") < s.indexOf("\"metric\":"), s)
    // first run ever: no reference fields at all (not empty/null ones)
    val first = Bench.summaryJson(Seq("a" -> ((1.0, 2.0))), leaked = 0, sfDir = "d")
    assert(!first.contains("reference_quiet_total"), first)
  }
}
