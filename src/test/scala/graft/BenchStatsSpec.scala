package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the host-factor-aware suspect policy (round-8 verdict item 1):
  * a uniformly loaded box must report ZERO suspects while a genuinely
  * regressed query still flags — against synthetic references, no Spark.
  */
class BenchStatsSpec extends AnyFunSuite {

  // 20 reference-bearing queries, clean refs 0.3..2.2 s
  private val refs: Seq[Double] = (1 to 20).map(i => 0.2 + 0.1 * i)

  test("flat 1.4x co-tenant box: factor ~1.4, zero suspects") {
    // every query runs at exactly 1.4x its reference (the r7 signature)
    val warms = refs.map(_ * 1.4)
    val f = BenchStats.hostFactor(refs.zip(warms).map { case (r, w) =>
      BenchStats.ratioVsRef(w, r) })
    assert(math.abs(f - 1.4) < 1e-9)
    refs.zip(warms).foreach { case (r, w) =>
      // cold a bit above warm (normal), so only the ref trigger is live
      assert(!BenchStats.suspect(cold = w * 1.2, warm = w, ref = Some(r),
        factor = f), s"ref=$r warm=$w spuriously suspect at factor $f")
    }
  }

  test("raw (factor-less) trigger WOULD flag quiet-window refs at 1.4x") {
    // the failure mode being fixed: 2.5x on a single quiet-window ref
    // under a flat 1.4x box is co-tenancy, not regression
    val quietRef = 0.8
    val warm = quietRef * 2.5 // e.g. r7's q29: fold 2.13 vs ref 0.80
    assert(BenchStats.suspectVsRef(warm, quietRef, factor = 1.0))
    assert(!BenchStats.suspectVsRef(warm, quietRef, factor = 1.4))
  }

  test("genuine regression still flags on a loaded box") {
    // box-wide factor 1.4, one query at 3x its ref (> 2x the factor)
    val warms = refs.map(_ * 1.4)
    val regressedRef = 1.0
    val regressedWarm = 3.0
    val ratios = refs.zip(warms).map { case (r, w) =>
      BenchStats.ratioVsRef(w, r) } :+
      BenchStats.ratioVsRef(regressedWarm, regressedRef)
    val f = BenchStats.hostFactor(ratios)
    assert(f < 1.5, "one outlier must not drag the median factor")
    assert(BenchStats.suspect(cold = regressedWarm * 1.2,
      warm = regressedWarm, ref = Some(regressedRef), factor = f))
  }

  test("genuine regression still flags on an idle box (factor clamps to 1)") {
    val ratios = refs.map(_ => 1.0)
    val f = BenchStats.hostFactor(ratios)
    assert(f == 1.0)
    assert(BenchStats.suspect(cold = 3.0, warm = 2.5, ref = Some(1.0),
      factor = f))
  }

  test("factor never tightens below 1.0 on a faster-than-ref box") {
    val f = BenchStats.hostFactor(Seq.fill(10)(0.8))
    assert(f == 1.0)
    // 1.9x a reference is NOT suspect even though the box runs at 0.8x
    assert(!BenchStats.suspectVsRef(1.9, 1.0, f))
  }

  test("fewer than MinSamples reference ratios degrade to factor 1.0") {
    assert(BenchStats.hostFactor(Seq(1.4, 1.4, 1.4, 1.4)) == 1.0)
    assert(BenchStats.hostFactor(Seq(1.4, 1.4, 1.4, 1.4, 1.4)) == 1.4)
  }

  test("warm-vs-cold trigger is self-relative: factor does not apply") {
    // additive noise made steady-state slower than the compile-included
    // cold pass — suspicious at ANY host factor
    assert(BenchStats.suspectVsCold(cold = 1.0, warm = 1.6))
    assert(!BenchStats.suspectVsCold(cold = 1.0, warm = 1.4))
    // sub-0.3s floor: scheduling jitter on trivial queries never flags
    assert(!BenchStats.suspectVsCold(cold = 0.05, warm = 0.2))
    assert(!BenchStats.suspectVsRef(0.2, 0.05, 1.0))
  }

  test("median is robust: 3 regressions among 20 do not lift the factor") {
    val ratios = Seq.fill(17)(1.4) ++ Seq.fill(3)(4.0)
    val f = BenchStats.hostFactor(ratios)
    assert(math.abs(f - 1.4) < 1e-9)
  }

  test("end-of-run re-pass clears a transient co-tenant burst") {
    // Synthetic load: one query's warm passes all landed inside a
    // co-tenant burst (3x its ref on an otherwise-clean box) — suspect
    // at the end of the main loop. The burst has ENDED by the end of
    // the run; the single re-pass observation folds in a clean time
    // and the flag clears inside the artifact (r8: all 4 recorded
    // suspects were exactly this).
    val warms = refs.map(_ * 1.0) // clean box elsewhere: factor 1.0
    val f = BenchStats.hostFactor(refs.zip(warms).map { case (r, w) =>
      BenchStats.ratioVsRef(w, r) })
    val (ref0, burstWarm, cleanObs) = (0.5, 1.5, 0.52)
    assert(BenchStats.suspect(cold = 1.6, warm = burstWarm,
      ref = Some(ref0), factor = f), "burst must flag at end of loop")
    val (w2, s2, n2) =
      BenchStats.foldObservation(burstWarm, 1.05, 2, cleanObs)
    assert(w2 == cleanObs && n2 == 3)
    assert(s2 > 2.5, "spread must record the burst-vs-clean range")
    assert(!BenchStats.suspect(cold = 1.6, warm = w2, ref = Some(ref0),
      factor = f), "one clean re-pass observation rescinds the flag")
  }

  test("re-pass fold never loosens: a still-slow regression keeps its flag") {
    val (w2, _, _) = BenchStats.foldObservation(1.5, 1.0, 2, 1.6)
    assert(w2 == 1.5, "min estimator: a slower re-pass cannot raise warm")
    assert(BenchStats.suspect(cold = 1.6, warm = w2, ref = Some(0.5),
      factor = 1.0), "genuine regression re-measures slow and stays flagged")
  }
}
