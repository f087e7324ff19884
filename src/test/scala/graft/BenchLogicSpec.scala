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

  test("wall budget: builder-profile fits, driver-2.6x-profile degrades (r19 #1)") {
    // builder host: ~400s warm-up, 3 runs → ~2000s projected, fits 3300
    assert(Bench.projectWall(400.0, 400.0, 3) == 2000.0)
    assert(Bench.projectWall(400.0, 400.0, 3) <= 3300.0)
    // the r19 driver host (~2.6x): ~1040s warm-up → projected 5200 > cap
    assert(Bench.projectWall(1040.0, 1040.0, 3) > 3300.0)
    // mid-run: healthy tail never trips; a tail that alone blows the
    // budget trips even when warm-up looked fine
    assert(!Bench.midRunDegrade(1500.0, 500.0, 3, 3300.0))
    assert(Bench.midRunDegrade(1500.0, 700.0, 3, 3300.0))
    // degraded tail at 1 run fits where 3 runs did not
    assert(!Bench.midRunDegrade(1500.0, 700.0, 1, 3300.0))
  }

  test("plan-tree hash: exprId-invariant, join-type- and schema-sensitive") {
    def plan(id1: Int, id2: Int, join: String, schema: String) =
      s"""Aggregate [x#$id1], [sum(y#$id2) AS s#99]
         |+- Join $join, (x#$id1 = k#$id2)
         |   :- Filter (y#$id2 > 1)
         |   :  +- Relation spark_catalog.t[$schema] parquet
         |   +- Relation spark_catalog.d[k#$id2] parquet""".stripMargin
    val base = Bench.hashPlanTree(plan(12, 13, "Inner", "x#12,y#13"))
    assert(base.matches("[0-9a-f]{12}"))
    // different exprIds, same tree → same hash (the RewriteDistinct-
    // Aggregates JVM-history-dependence defense)
    assert(Bench.hashPlanTree(plan(45, 46, "Inner", "x#45,y#46")) == base)
    // join TYPE is structural: Inner vs LeftAnti is a different plan
    assert(Bench.hashPlanTree(plan(12, 13, "LeftAnti", "x#12,y#13")) != base)
    // leaf relations keep their schema: lost column pruning moves it
    assert(Bench.hashPlanTree(
      plan(12, 13, "Inner", "x#12,y#13,z#14")) != base)
    // expression-level rewrites do NOT move it (oracle gate owns them):
    // the Filter line's predicate body is excluded from the hash
    assert(Bench.hashPlanTree(plan(12, 13, "Inner", "x#12,y#13")
      .replace("(y#13 > 1)", "(y#13 >= 2)")) == base)
  }
}
