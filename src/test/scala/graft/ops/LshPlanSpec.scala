package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** [[Dedup.lshPlan]]: the MMDS banding heuristic — midpoint math,
  * divisor enumeration, tie-breaks, S-curve shape. Pure driver
  * arithmetic, no Spark session needed. */
class LshPlanSpec extends AnyFunSuite {

  test("picks the divisor pair whose S-curve midpoint is closest to the threshold") {
    // n=16, t=0.5: midpoints are b=2/r=8 -> 0.917, b=4/r=4 -> 0.707,
    // b=8/r=2 -> 0.354, b=16/r=1 -> 0.0625; 0.354 is closest to 0.5
    val p = Dedup.lshPlan(16, 0.5)
    assert((p.bands, p.rowsPerBand) == ((8, 2)))
    assert(math.abs(p.midpoint - math.pow(1.0 / 8, 1.0 / 2)) < 1e-12)
    // n=16, t=0.7: b=4/r=4 midpoint 0.707 wins
    assert(Dedup.lshPlan(16, 0.7).bands == 4)
    // n=8, t=0.5 (the portable twin shape): b=4/r=2 -> 0.5 exactly
    val p8 = Dedup.lshPlan(8, 0.5)
    assert((p8.bands, p8.rowsPerBand) == ((4, 2)))
    assert(math.abs(p8.midpoint - 0.5) < 1e-12)
  }

  test("candidateProb is the 1-(1-s^r)^b S-curve: monotone, ~1-1/e at the midpoint") {
    val p = Dedup.lshPlan(16, 0.7) // b=4, r=4
    val probs = (1 to 99).map(i => p.candidateProb(i / 100.0))
    assert(probs == probs.sorted)
    assert(math.abs(p.candidateProb(p.midpoint) - (1 - math.pow(1 - 1.0 / p.bands, p.bands))) < 1e-12)
    assert(p.candidateProb(p.midpoint) > 0.60 && p.candidateProb(p.midpoint) < 0.70)
    // far below the midpoint pairs are mostly never candidates
    assert(p.candidateProb(0.2) < 0.01)
    assert(p.candidateProb(0.95) > 0.95)
  }

  test("ties break toward fewer bands; degenerate and invalid inputs") {
    // n=1: only b=1/r=1, midpoint 1.0
    assert(Dedup.lshPlan(1, 0.5) == Dedup.LshPlan(1, 1, 1.0,
      Dedup.lshPlan(1, 0.5).pAtThreshold))
    intercept[IllegalArgumentException](Dedup.lshPlan(0, 0.5))
    intercept[IllegalArgumentException](Dedup.lshPlan(16, 0.0))
    intercept[IllegalArgumentException](Dedup.lshPlan(16, 1.0))
  }
}
