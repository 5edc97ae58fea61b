package graft

import org.scalatest.funsuite.AnyFunSuite

/** Bench self-validation plumbing. The one test that matters most here is
  * the first: round 12's `scripts/bench_ref.json` was re-stamped
  * pretty-printed and the then-literal `"queries":{` split parsed NOTHING,
  * so the per-query outlier/regression gate ran over an empty map and
  * silently read all-clean for the whole round (VERDICT r12 item 1). The
  * committed reference must always parse non-empty, whatever whitespace
  * style the last re-stamp used. */
class BenchSpec extends AnyFunSuite {

  test("committed scripts/bench_ref.json parses non-empty (the r12 dead-gate regression)") {
    val ref = Bench.refTimes("scripts/bench_ref.json")
    assert(ref.size >= 100,
      s"committed bench reference parsed only ${ref.size} queries — the outlier gate is dead again")
    // spot-pin a known row: q01_pricing_summary → qNN-prefix key, numeric time
    assert(ref.contains("q01"), s"q01 missing from parsed ref keys: ${ref.keys.toSeq.sorted.take(5)}")
    assert(ref("q01") > 0.0 && ref("q01") < 60.0)
  }

  test("refTimes parses the compact single-line form too") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_ref")
    val p = dir.resolve("compact.json")
    java.nio.file.Files.writeString(p,
      """{"metric":"total","value":1.0,"queries":{"q01_x":0.5,"q02_y":1.25},"best":{"q01_x":0.4}}""")
    val ref = Bench.refTimes(p.toString)
    assert(ref == Map("q01" -> 0.5, "q02" -> 1.25))
  }

  test("refTimes parses a pretty-printed form with spaces and newlines") {
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_ref")
    val p = dir.resolve("pretty.json")
    java.nio.file.Files.writeString(p,
      "{\n \"value\": 1.0,\n \"queries\": {\n  \"q01_x\": 0.5,\n  \"q02_y\": 1.25\n },\n \"best\": {\n  \"q01_x\": 9.9\n }\n}\n")
    val ref = Bench.refTimes(p.toString)
    assert(ref == Map("q01" -> 0.5, "q02" -> 1.25),
      s"pretty-printed ref must parse identically, got $ref")
  }

  test("missing or queries-less ref parses empty (gate-off is stamped by main, not hidden)") {
    assert(Bench.refTimes("/no/such/file.json").isEmpty)
    val dir = java.nio.file.Files.createTempDirectory("graft_bench_ref")
    val p = dir.resolve("noqueries.json")
    java.nio.file.Files.writeString(p, """{"value": 1.0}""")
    assert(Bench.refTimes(p.toString).isEmpty)
  }

  test("HostStat: /proc/stat snapshot + drag self-attribution on this box") {
    import graft.util.HostStat
    val s0 = HostStat.snapshot()
    assert(s0.available, "/proc/stat must be readable on the Linux CI box")
    assert(s0.nCpu >= 1 && s0.selfCpuNanos > 0)
    // burn ~0.5 s of CPU in THIS process: the drag window must attribute
    // it to selfCores, leaving otherCores near idle (the whole point —
    // external consumers land in otherCores instead)
    val deadline = System.nanoTime() + 500000000L
    var x = 1L
    while (System.nanoTime() < deadline) { x = x * 6364136223846793005L + 1442695040888963407L }
    assert(x != 0) // keep the loop un-eliminable
    Thread.sleep(200) // let the tick counters advance past one jiffy
    val s1 = HostStat.snapshot()
    val d = HostStat.drag(s0, s1)
    assert(d.available && d.wallSec > 0.5)
    assert(d.selfCores > 0.3, s"own busy-loop must show in selfCores: $d")
    assert(d.busyCores >= d.selfCores - 0.35,
      s"busyCores can't be far below selfCores: $d")
    assert(d.otherCores >= 0.0 && d.stealPct >= 0.0 && d.iowaitPct >= 0.0)
    // degenerate pair (same instant / unavailable) degrades, never lies
    val dz = HostStat.drag(s1, s1)
    assert(!dz.available && dz.otherCores == -1)
  }
}
