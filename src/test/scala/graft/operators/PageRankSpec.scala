package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PageRankSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 10): Map[Long, Long] =
    PageRank.run(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("two-node cycle is the exact fixed point") {
    // p₀ = 10¹²/2; contribution = p (deg 1); update = teleport +
    // (85·p)//100 = 75·10⁹ + 425·10⁹ = 5·10¹¹ = p₀ — stable forever
    val r = ranks(Seq((1L, 2L), (2L, 1L)))
    assert(r == Map(1L -> 500000000000L, 2L -> 500000000000L))
  }

  test("hand-computed star with dangling center: exact integer walk") {
    // a→b, c→b; b dangling. p₀ = 10¹²//3 = 333333333333,
    // teleport = (15·333333333333)//100 = 49999999999.
    // it1: b = teleport + (85·666666666666)//100 = 616666666665;
    //      a = c = teleport.
    // it2+: b = teleport + (85·(2·teleport))//100 = 134999999997 — the
    // fixed point all later iterations preserve; a, c stay at teleport.
    val r = ranks(Seq((1L, 2L), (3L, 2L)))
    assert(r(1L) == 49999999999L && r(3L) == 49999999999L, s"leaves: $r")
    assert(r(2L) == 134999999997L, s"center: $r")
    // one iteration shows the pre-fixpoint value — the loop really runs
    val r1 = ranks(Seq((1L, 2L), (3L, 2L)), iters = 1)
    assert(r1(2L) == 616666666665L, s"it1 center: $r1")
  }

  test("rank order follows in-link mass; deterministic under repartition") {
    // 1..6 all point at 7; 7 points at 1. The 7↔1 loop OSCILLATES at
    // finite iteration counts (1 receives 100% of 7's mass each step
    // — the classic power-iteration 2-cycle), so the parity-stable
    // claim is: both hub nodes far outrank the teleport-only leaves
    val edges = (1L to 6L).map(i => (i, 7L)) :+ ((7L, 1L))
    val r = ranks(edges)
    assert(r(7L) > 5 * r(2L) && r(1L) > 5 * r(2L), s"order: $r")
    assert((2L to 6L).map(r).toSet.size == 1, "symmetric leaves tie exactly")
    val again = PageRank.run(edges.toDF("s", "d").repartition(5), "s", "d")
      .as[(Long, Long)].collect().toMap
    assert(again == r, "integer arithmetic must be layout-independent")
  }

  test("parallel edges each carry a contribution; empty graph throws") {
    // duplicate a→b doubles a's out-degree AND sends two halves: same
    // total as one edge up to floor loss (deg 2 → two rank//2 shares)
    val single = ranks(Seq((1L, 2L)))
    val dup = ranks(Seq((1L, 2L), (1L, 2L)))
    assert(math.abs(single(2L) - dup(2L)) <= 1L, s"$single vs $dup")
    intercept[IllegalArgumentException] {
      PageRank.run(Seq.empty[(Long, Long)].toDF("s", "d"), "s", "d")
    }
  }
}
