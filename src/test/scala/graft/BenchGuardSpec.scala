package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench artifact-of-record protections (pure rules, no Spark):
  *
  *  - the overwrite guard's floor rule (r19 verdict item 3), gate rule
  *    and pinned-ratio quality rule (r20 verdict item 2, refined in r21:
  *    the pinned ratio divides every reading by the SAME committed
  *    denominator, so it orders numerators weather-free; the verdict's
  *    literal ratio_batch_max mixes each session's own DuckDB
  *    denominator and refused the best numerator ever measured);
  *  - the mid-run weather watchdog's degraded-probe rule (r20 verdict
  *    item 4 — bursts arriving mid-run poisoned one side of the
  *    same-session ratio while the single up-front probe read quiet).
  */
class BenchGuardSpec extends AnyFunSuite {
  import Bench.GuardReading

  private def r(floor: Double, gate: Boolean, pinned: Double,
      max: Double) = GuardReading(Some(floor), Some(gate), Some(pinned),
    Some(max))

  test("guard accepts a comparable-box reading with a better pinned " +
      "ratio even when its same-session ratio is worse — the r21 " +
      "fast-DuckDB session") {
    // r19 committed: 1.702 same-session / 2.035 pinned, floor 0.066.
    // r21 run: batch 126.5 s -> pinned 1.666 (best numerator ever) but
    // same-session 2.248 because DuckDB ran 38% faster that hour.
    assert(Bench.guardVerdict(
      r(0.066, gate = false, pinned = 2.035, max = 2.035),
      r(0.047, gate = false, pinned = 1.666, max = 2.248)).isEmpty)
  }

  test("guard refuses a floor more than 2x the committed artifact's") {
    val v = Bench.guardVerdict(
      r(0.066, gate = false, pinned = 2.035, max = 2.035),
      r(0.14, gate = true, pinned = 1.7, max = 1.7))
    assert(v.isDefined && v.get.contains("floor"))
  }

  test("guard refuses a pinned-worse reading even when the floor " +
      "passes — the exact r20 driver-run gap") {
    val v = Bench.guardVerdict(
      r(0.066, gate = false, pinned = 2.035, max = 2.035),
      r(0.089, gate = false, pinned = 2.724, max = 2.724))
    assert(v.isDefined && v.get.contains("ratio_batch_pinned"))
  }

  test("gate status dominates the pinned comparison in both directions") {
    // gate-true newcomer replaces a gate-false holder despite a worse
    // pinned ratio ...
    assert(Bench.guardVerdict(
      r(0.066, gate = false, pinned = 1.666, max = 2.248),
      r(0.06, gate = true, pinned = 1.78, max = 1.95)).isEmpty)
    // ... and a gate-true holder never yields to a gate-false newcomer,
    // pinned ratio notwithstanding.
    val v = Bench.guardVerdict(
      r(0.06, gate = true, pinned = 1.78, max = 1.95),
      r(0.06, gate = false, pinned = 1.5, max = 2.3))
    assert(v.isDefined && v.get.contains("gate_2x"))
  }

  test("guard accepts an equal pinned ratio (fresh same-quality reading)") {
    assert(Bench.guardVerdict(
      r(0.066, gate = false, pinned = 2.035, max = 2.035),
      r(0.066, gate = false, pinned = 2.035, max = 2.035)).isEmpty)
  }

  test("guard degrades to the comparable rules when fields are missing") {
    val none = GuardReading(None, None, None, None)
    // No prior artifact at all: accept.
    assert(Bench.guardVerdict(none,
      r(0.5, gate = false, pinned = 9.9, max = 9.9)).isEmpty)
    // Prior has only a floor (old-format artifact): floor rule bites,
    // ratio rules cannot compare.
    assert(Bench.guardVerdict(GuardReading(Some(0.066), None, None, None),
      r(0.2, gate = true, pinned = 1.0, max = 1.0)).isDefined)
    // No pinned on either side: fall back to ratio_batch_max.
    val v = Bench.guardVerdict(
      GuardReading(Some(0.066), None, None, Some(2.0)),
      GuardReading(Some(0.06), None, None, Some(2.5)))
    assert(v.isDefined && v.get.contains("ratio_batch_max"))
    // This run produced no ratios (no duckdb + no pinned baseline):
    // the quality rules cannot compare, the floor rule still protects.
    assert(Bench.guardVerdict(
      r(0.066, gate = false, pinned = 2.035, max = 2.035),
      GuardReading(Some(0.06), None, None, None)).isEmpty)
    assert(Bench.guardVerdict(
      r(0.066, gate = false, pinned = 2.035, max = 2.035),
      GuardReading(Some(0.2), None, None, None)).isDefined)
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
