package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the pure decision cores of the bench harness — the parts of
  * the record pipeline r18 proved must be testable WITHOUT a 30-minute
  * run: the rerun-amplification cap (r18 VERDICT #3) and the
  * whole-record suspect terms (r17 VERDICT #5 / r18 #2). The
  * timeout-survivability machinery (shutdown hook, progress file) is
  * exercised end-to-end by a kill -TERM drill against the real main;
  * these tests own the arithmetic.
  */
class BenchLogicSpec extends AnyFunSuite {

  test("median/spread: failure poisons, otherwise order statistics") {
    assert(Bench.median(Seq(3.0, 1.0, 2.0)) == 2.0)
    assert(Bench.median(Seq(3.0, -1.0, 2.0)) == -1.0)
    assert(Bench.spread(Seq(2.0, 1.0, 1.5)) == 2.0)
    assert(Bench.spread(Seq(2.0, 0.0)) == -1.0)
  }

  test("rerun cap: fires only past 20 measured AND >25% flagged") {
    assert(!Bench.broadNoiseLive(flagged = 10, measured = 19),
      "below 20 measured the cap must never fire")
    assert(!Bench.broadNoiseLive(flagged = 5, measured = 20),
      "exactly 25% is not past the threshold")
    assert(Bench.broadNoiseLive(flagged = 6, measured = 20))
    // the r18 driver profile: 131 of 222 flagged — the cap fires long
    // before the run burns 40% of its wall on spread reruns
    assert(Bench.broadNoiseLive(flagged = 131, measured = 222))
  }

  test("plansStable: >=95% of known hashes unchanged, >=20 known") {
    assert(!Bench.plansStable(plansKnown = 19, plansSame = 19),
      "a near-empty baseline must not qualify")
    assert(Bench.plansStable(plansKnown = 20, plansSame = 19))
    assert(!Bench.plansStable(plansKnown = 20, plansSame = 18))
    assert(Bench.plansStable(plansKnown = 222, plansSame = 211))
    assert(!Bench.plansStable(plansKnown = 222, plansSame = 210))
  }

  test("whole-record sum term: quiet run stays None, degraded replay trips, plan churn disarms") {
    val comparable = (1 to 40).map(i => (s"q$i", 1.0))
    // quiet: every fresh median within noise of history
    val quiet = comparable.map { case (n, h) => n -> h * 1.1 }.toMap
    assert(Bench.wholeRecordSuspect(comparable, quiet, 40, 40).isEmpty)
    // the r18 degraded-host replay: everything ~1.7x, no single query
    // gross — the per-query guards under-detect, this term must fire
    val degraded = comparable.map { case (n, h) => n -> h * 1.7 }.toMap
    val hit = Bench.wholeRecordSuspect(comparable, degraded, 40, 40)
    assert(hit.nonEmpty && hit.get.contains("sum_of_medians"), s"$hit")
    // plan churn means "different code", not "slow host": disarmed
    assert(Bench.wholeRecordSuspect(comparable, degraded,
      plansKnown = 40, plansSame = 30).isEmpty)
  }

  test("whole-record wall term: trips on 1.5x wall with stable plans, absent baseline disarms") {
    assert(Bench.wallSuspect(600.0, Some(300.0), 40, 40).nonEmpty)
    assert(Bench.wallSuspect(400.0, Some(300.0), 40, 40).isEmpty,
      "1.33x wall is within the band")
    assert(Bench.wallSuspect(600.0, None, 40, 40).isEmpty,
      "pre-r19 baselines carry no wall — no false trips")
    assert(Bench.wallSuspect(600.0, Some(300.0), 40, 30).isEmpty,
      "plan churn disarms the wall axis too")
  }

  test("gross guard: ratio OR absolute-seconds axis (r15 #1 arithmetic)") {
    val comparable = Seq(("cheap", 0.2), ("mid", 2.0), ("big", 8.0))
    val fresh = Map("cheap" -> 0.7, "mid" -> 2.2, "big" -> 20.8)
    // cheap: 3.5x ratio-gross; big: 2.6x but +12.8s seconds-gross;
    // mid: neither
    assert(Bench.grossOf(comparable, fresh, 3.0, 1.5).toSet ==
      Set("cheap", "big"))
    assert(Bench.inflatedOf(comparable, fresh, 1.5).toSet ==
      Set("cheap", "big"))
  }
}
