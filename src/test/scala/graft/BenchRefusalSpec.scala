package graft

import org.scalatest.funsuite.AnyFunSuite

/** The degraded-window refusal verdict (r17 verdict item 1): BENCH_r17.json
  * was a loaded-host artifact (55 est / 113 suspect, totals ~14× the clean
  * windows at the same HEAD) that the harness flagged but still recorded.
  * [[Bench.windowVerdict]] is the one decision that makes such a window
  * UNRECORDABLE: the bench's bounded re-runs (multi-pass min-merge + suspect
  * re-probes) are the "rerun" arm, and a window that still closes past the
  * flag threshold is refused — detail diverted off the record path, stdout
  * line tagged "refused":true, nonzero exit. This spec drives the decision
  * function through the r17 artifact's shape and the clean-window shapes; the
  * wiring (divert + exit 2) is exercised by reading the emitted line's fields
  * in any refused run's tools/bench_refused_latest.json.
  */
class BenchRefusalSpec extends AnyFunSuite {

  private val floorMax = 0.08

  test("the BENCH_r17 shape (55 est / 113 suspect) is refused") {
    val v = Bench.windowVerdict(suspectN = 113, estN = 55, measured = 149,
      floorEnd = 0.3, floorMax = floorMax, maxSuspects = 10)
    assert(v.isDefined, "a mass-flagged window must be refused")
    assert(v.get.contains("suspect_n=113"))
  }

  test("a clean full window (0 est / 0-1 suspect, clean floor) records") {
    assert(Bench.windowVerdict(0, 0, 131, 0.04, floorMax, 10).isEmpty)
    assert(Bench.windowVerdict(1, 0, 131, 0.04, floorMax, 10).isEmpty,
      "one transient suspect inside the threshold is a recordable window")
  }

  test("flags at the threshold record; one past it refuses") {
    assert(Bench.windowVerdict(10, 0, 131, 0.04, floorMax, 10).isEmpty)
    assert(Bench.windowVerdict(11, 0, 131, 0.04, floorMax, 10).isDefined)
    assert(Bench.windowVerdict(0, 11, 131, 0.04, floorMax, 10).isDefined,
      "est-only mass flagging (censored fallbacks) refuses too")
  }

  test("a degraded end floor refuses only with surviving suspects") {
    // floor > 2x max AND suspects survived the re-probes: the drag is
    // still on and touched real queries — refuse
    assert(Bench.windowVerdict(3, 0, 131, 0.2, floorMax, 10).isDefined)
    // floor degraded at the very end but every query measured clean:
    // the measurements predate the drag — record (the floor stays in the
    // JSON for the reader)
    assert(Bench.windowVerdict(0, 0, 131, 0.2, floorMax, 10).isEmpty)
  }

  test("an empty window is not a refusal (the partial flag covers it)") {
    assert(Bench.windowVerdict(0, 0, 0, 9.9, floorMax, 10).isEmpty)
  }

  test("refusal recovery (r18 verdict item 1): a refused window retries with linear backoff, bounded") {
    // default protocol: 2 retries at base 60 s — attempt 1's refusal waits
    // 60 s, attempt 2's waits 120 s, attempt 3's refusal is terminal
    assert(Bench.windowRetryBackoff(attemptsDone = 1, maxRetries = 2, baseBackoffSec = 60.0)
      === Some(60.0))
    assert(Bench.windowRetryBackoff(2, 2, 60.0) === Some(120.0))
    assert(Bench.windowRetryBackoff(3, 2, 60.0) === None,
      "after the bounded retries the refusal becomes the exit verdict")
    // retries disabled (driver that prefers its own re-invoke loop)
    assert(Bench.windowRetryBackoff(1, 0, 60.0) === None)
    // a negative backoff config can never produce a sleep
    assert(Bench.windowRetryBackoff(1, 2, -1.0) === None)
  }
}
