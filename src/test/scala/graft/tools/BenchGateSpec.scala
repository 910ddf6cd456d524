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
}
