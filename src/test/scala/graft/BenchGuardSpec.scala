package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact-of-record protections (pure rules, no Spark):
  *
  *  - the overwrite guard's floor rule (r19 verdict item 3) and ratio
  *    rule (r20 verdict item 2 — a 1.35x-floor run slipped past the
  *    floor check and replaced a 1.702/2.035 reading with 1.929/2.724);
  *  - the mid-run weather watchdog's degraded-probe rule (r20 verdict
  *    item 4 — bursts arriving mid-run poisoned one side of the
  *    same-session ratio while the single up-front probe read quiet).
  */
class BenchGuardSpec extends AnyFunSuite {

  test("guard accepts a reading on a comparable box with a better ratio") {
    assert(Bench.guardVerdict(Some(0.066), Some(2.035), 0.064,
      Some(1.95)).isEmpty)
  }

  test("guard refuses a floor more than 2x the committed artifact's") {
    val v = Bench.guardVerdict(Some(0.066), Some(2.035), 0.14, Some(1.7))
    assert(v.isDefined && v.get.contains("floor"))
  }

  test("guard refuses a ratio worse than the committed artifact's even " +
      "when the floor passes — the exact r20 driver-run gap") {
    val v = Bench.guardVerdict(Some(0.066), Some(2.035), 0.089, Some(2.724))
    assert(v.isDefined && v.get.contains("ratio_batch_max"))
  }

  test("guard accepts an equal ratio (fresh same-quality reading)") {
    assert(Bench.guardVerdict(Some(0.066), Some(2.035), 0.066,
      Some(2.035)).isEmpty)
  }

  test("guard degrades to the comparable rules when a side is missing") {
    // No prior artifact at all: accept.
    assert(Bench.guardVerdict(None, None, 0.5, Some(9.9)).isEmpty)
    // Prior has no ratio (old-format artifact): floor rule still bites.
    assert(Bench.guardVerdict(Some(0.066), None, 0.2, Some(1.0)).isDefined)
    // This run produced no ratios (no duckdb + no pinned baseline):
    // the ratio rule cannot compare, the floor rule still protects.
    assert(Bench.guardVerdict(Some(0.066), Some(2.035), 0.06, None).isEmpty)
    assert(Bench.guardVerdict(Some(0.066), Some(2.035), 0.2, None).isDefined)
  }

  test("watchdog: degraded means > 2x the opening floor AND > 0.1 s " +
      "absolute") {
    assert(Bench.watchdogDegraded(0.066, 0.15))
    // Just under 2x: not degraded.
    assert(!Bench.watchdogDegraded(0.066, 0.13))
    // Fast-box blip: 0.03 -> 0.07 is > 2x but under the absolute bar.
    assert(!Bench.watchdogDegraded(0.03, 0.07))
    // Quiet probe on a quiet box.
    assert(!Bench.watchdogDegraded(0.066, 0.066))
  }
}
