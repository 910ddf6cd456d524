package graft.tools

/** The bench baseline promotion gate, factored pure so BenchGateSpec
  * can pin it (r17 verdict item #1 — the ratchet).
  *
  * History of the defect: bench_baseline.json self-promotes on every
  * clean run, and the >2× per-query regression test compared against
  * the CURRENT baseline — so each promotion re-anchored the
  * comparison, and a slow uniform drift (r16→r17: +10.5% per shared
  * key, 7 untouched keys ending >2× their r16 walls) ratcheted
  * through a chain of runs each reporting "zero regressions". No
  * per-query heuristic can see a fleet-wide +3%-per-promotion creep;
  * only an anchor that does NOT move with promotions can.
  *
  * The fix has two parts, both decided here:
  *   - the per-query retry/regression prior comes from
  *     `bench_anchor.json`, a copy of the pinned baseline taken at
  *     ROUND OPEN and never written by a promotion (Bench creates it
  *     only when absent; refreshing it is a deliberate round-ritual
  *     act recorded in PLANS.md);
  *   - promotion of a clean run to bench_baseline.json is gated on
  *     the run's shared-key aggregate wall ratio vs that anchor:
  *     above `maxRatio` (default 1.05) the run may NOT self-promote
  *     unless an explicit adjudication note (env
  *     SPARK_GRAFT_PROMOTE_NOTE) names the accepted cause; the note
  *     and the ratio both land in the artifact either way.
  */
object BenchGate {

  /** Aggregate wall ratio over the keys both maps share: Σ candidate
    * / Σ anchor. None when there is no shared key (fresh checkout /
    * different sf) or the anchor sums to nothing — callers treat
    * None as "no evidence", not "clean".
    */
  def sharedKeyRatio(candidate: Map[String, Double],
      anchor: Map[String, Double]): Option[Double] = {
    val shared = candidate.keySet & anchor.keySet
    if (shared.isEmpty) None
    else {
      val a = shared.iterator.map(anchor).sum
      if (a <= 0.0) None
      else Some(shared.iterator.map(candidate).sum / a)
    }
  }

  /** May this run's walls become the new pinned baseline? A uniform
    * slowdown beyond `maxRatio` vs the round-open anchor refuses
    * self-promotion; an adjudication note (a non-blank cause string)
    * overrides, because some drifts are real and accepted (a board
    * that grew heavier queries) — but then the note is part of the
    * record, never silence.
    */
  def promotionAllowed(candidate: Map[String, Double],
      anchor: Map[String, Double], maxRatio: Double,
      adjudication: Option[String]): Boolean =
    adjudication.exists(_.trim.nonEmpty) ||
      sharedKeyRatio(candidate, anchor).forall(_ <= maxRatio)

  /** Per-key pin rule for a promotion (r18 verdict "What's wrong"
    * #1): the q102_rolling_median pin jumped 0.60 s → 1.22 s off ONE
    * noisy sample inside an otherwise-clean run, then the anchor
    * refresh baked the bad wall in — doubling that key's regression
    * headroom. A single clean sample is good evidence a query got
    * FASTER (the plan is a lower bound witness) but weak evidence it
    * got slower (one scheduling hiccup suffices), so pins are
    * asymmetric: a candidate wall replaces the prior pin freely
    * downward or within noise, but a rise beyond `maxRise`× AND
    * `minAbsRise` seconds keeps the prior pin and reports the key as
    * held — a genuine plan-cost increase reproduces next clean run
    * (where the same rule holds it again) and is accepted via an
    * adjudication note, which disables holding entirely.
    *
    * Returns (walls to pin, keys held at their prior pin).
    */
  def pinWalls(candidate: Map[String, Double],
      priorPins: Map[String, Double], maxRise: Double,
      minAbsRise: Double,
      adjudication: Option[String]): (Map[String, Double], Seq[String]) = {
    val adjudicated = adjudication.exists(_.trim.nonEmpty)
    val held = if (adjudicated) Seq.empty[String]
      else candidate.collect { case (k, v)
        if priorPins.get(k)
          .exists(p => v > maxRise * p && v - p > minAbsRise) => k
      }.toSeq.sorted
    val heldSet = held.toSet
    val walls = candidate.map { case (k, v) =>
      k -> (if (heldSet(k)) priorPins(k) else v)
    }
    (walls, held)
  }
}
