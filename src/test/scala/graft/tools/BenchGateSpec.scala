package graft.tools

import org.scalatest.funsuite.AnyFunSuite

/** Pins the anti-ratchet promotion gate (r17 verdict item #1): the
  * exact failure mode the r17 judge measured — a uniform ~+10%
  * per-key slowdown with no single key tripping the >2× per-query
  * heuristic — must REFUSE self-promotion, because that is the drift
  * that ratcheted r16→r17 baselines +10.5% through a chain of runs
  * each reporting "zero regressions".
  */
class BenchGateSpec extends AnyFunSuite {
  import BenchGate._

  private val anchor = (1 to 50).map(i => s"q$i" -> (0.5 + i * 0.1)).toMap

  test("a synthetic +10% uniform slowdown fails promotion") {
    val slow = anchor.view.mapValues(_ * 1.10).toMap
    assert(sharedKeyRatio(slow, anchor).exists(r =>
      math.abs(r - 1.10) < 1e-9))
    assert(!promotionAllowed(slow, anchor, 1.05, None),
      "the r17 ratchet drift must not self-promote")
  }

  test("a within-gate run (+3%) promotes") {
    val ok = anchor.view.mapValues(_ * 1.03).toMap
    assert(promotionAllowed(ok, anchor, 1.05, None))
  }

  test("an adjudication note overrides, a blank one does not") {
    val slow = anchor.view.mapValues(_ * 1.30).toMap
    assert(promotionAllowed(slow, anchor, 1.05,
      Some("board grew 14 heavier keys, re-pinned per PLANS.md")))
    assert(!promotionAllowed(slow, anchor, 1.05, Some("   ")),
      "a blank note is not an adjudication")
  }

  test("no shared keys (fresh checkout / sf switch) is no evidence — promote") {
    assert(sharedKeyRatio(Map("a" -> 1.0), anchor).isEmpty)
    assert(promotionAllowed(Map("a" -> 1.0), anchor, 1.05, None))
    assert(promotionAllowed(Map("a" -> 1.0), Map.empty, 1.05, None))
  }

  test("ratio weighs shared keys only — new keys don't dilute the drift") {
    // 50 shared keys +10%, plus 50 brand-new fast keys: the new keys
    // must not launder the shared-key drift below the gate
    val cand = anchor.view.mapValues(_ * 1.10).toMap ++
      (51 to 100).map(i => s"n$i" -> 0.01).toMap
    assert(sharedKeyRatio(cand, anchor).exists(r =>
      math.abs(r - 1.10) < 1e-9))
    assert(!promotionAllowed(cand, anchor, 1.05, None))
  }

  test("speedups promote freely (ratio < 1)") {
    val fast = anchor.view.mapValues(_ * 0.8).toMap
    assert(promotionAllowed(fast, anchor, 1.05, None))
  }

  // --- pinWalls: the r18 q102_rolling_median noise pin, generalized.
  // One noisy sample raised a 0.60 s pin to 1.22 s inside an
  // otherwise-clean promoted run; the per-key rule must hold such a
  // key at its prior pin while letting speedups and in-noise moves
  // through, and an adjudication note must disable holding.

  test("pinWalls holds a >1.5x single-sample rise at the prior pin") {
    val prior = Map("q102" -> 0.60, "q1" -> 2.00)
    val cand = Map("q102" -> 1.22, "q1" -> 2.05)
    val (walls, held) = pinWalls(cand, prior, 1.5, 0.5, None)
    assert(held == Seq("q102"))
    assert(walls("q102") == 0.60, "the noisy rise must not enter the pin")
    assert(walls("q1") == 2.05, "an in-noise move pins normally")
  }

  test("pinWalls lets speedups and sub-threshold rises through") {
    val prior = Map("a" -> 1.0, "b" -> 1.0, "c" -> 0.2)
    // a: faster; b: +40% (< 1.5x); c: 2x but only +0.2s (< minAbs)
    val cand = Map("a" -> 0.7, "b" -> 1.4, "c" -> 0.4)
    val (walls, held) = pinWalls(cand, prior, 1.5, 0.5, None)
    assert(held.isEmpty)
    assert(walls == cand)
  }

  test("pinWalls: new keys (no prior) always pin; adjudication disables holds") {
    val prior = Map("a" -> 1.0)
    val cand = Map("a" -> 5.0, "new" -> 9.9)
    val (w1, h1) = pinWalls(cand, prior, 1.5, 0.5, None)
    assert(h1 == Seq("a") && w1("a") == 1.0 && w1("new") == 9.9)
    val (w2, h2) = pinWalls(cand, prior, 1.5, 0.5,
      Some("q-a plan now does 5x the work, accepted per PLANS.md"))
    assert(h2.isEmpty && w2 == cand,
      "an adjudicated promotion pins the measured walls verbatim")
    val (_, h3) = pinWalls(cand, prior, 1.5, 0.5, Some("  "))
    assert(h3 == Seq("a"), "a blank note is not an adjudication")
  }
}
