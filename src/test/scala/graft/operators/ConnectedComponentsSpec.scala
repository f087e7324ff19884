package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ConnectedComponentsSpec extends SparkSpec {
  import spark.implicits._

  private def cc(edges: Seq[(Long, Long)]): Map[Long, Long] =
    ConnectedComponents.run(edges.toDF("src", "dst"), "src", "dst")
      .as[(Long, Long)].collect().toMap

  test("chains, cycles, and stars collapse to their minimum node") {
    // chain 1-2-3-4, separate cycle 10-11-12-10, star 20-(21,22,23)
    val out = cc(Seq(
      (1L, 2L), (2L, 3L), (3L, 4L),
      (10L, 11L), (11L, 12L), (12L, 10L),
      (20L, 21L), (20L, 22L), (20L, 23L)))
    assert(Seq(1L, 2L, 3L, 4L).forall(out(_) == 1L))
    assert(Seq(10L, 11L, 12L).forall(out(_) == 10L))
    assert(Seq(20L, 21L, 22L, 23L).forall(out(_) == 20L))
    assert(out.size == 11)
  }

  test("long path needs multiple rounds: fixpoint still reaches the min") {
    // path 1-2-...-9: diameter 8, converges within maxIters=10
    val out = cc((1L until 9L).map(i => (i, i + 1)))
    assert((1L to 9L).forall(out(_) == 1L))
  }

  test("path with diameter far beyond the round budget converges (r9 VERDICT #3)") {
    // path 1-2-...-300: min-label PROPAGATION would need 299 rounds —
    // the chain-shaped crawl cluster that aborted the old O(diameter)
    // loop at maxIters=10. Star CONTRACTION folds it within the same
    // default budget (rounds ~ log of component size, not diameter).
    val out = cc((1L until 300L).map(i => (i, i + 1)))
    assert(out.size == 300)
    assert((1L to 300L).forall(out(_) == 1L))
  }

  test("non-convergence THROWS instead of returning partial labels (r4 ADVICE #2)") {
    // path 1-...-64: one contraction round cannot reach the fixpoint —
    // run() must refuse, not hand back labels that are still
    // under-merged
    val deep = (1L until 64L).map(i => (i, i + 1)).toDF("src", "dst")
    val e = intercept[IllegalStateException] {
      ConnectedComponents.run(deep, "src", "dst", maxIters = 1)
    }
    assert(e.getMessage.contains("did not converge"))
    // the explicit opt-in surfaces the same labels plus the flag
    val (labels, converged, iters) =
      ConnectedComponents.runWithStatus(deep, "src", "dst", maxIters = 1)
    assert(!converged && iters == 1)
    assert(labels.count() == 64)
    // with enough rounds the same graph converges and run() returns
    val ok = ConnectedComponents.run(deep, "src", "dst", maxIters = 20)
      .as[(Long, Long)].collect().toMap
    assert((1L to 64L).forall(ok(_) == 1L))
  }

  test("self-loops and duplicate edges are inert; their nodes still appear") {
    val out = cc(Seq((7L, 7L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 3L)))
    assert(out == Map(7L -> 7L, 1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("deterministic under repartitioning and edge direction") {
    val edges = Seq((5L, 3L), (3L, 8L), (100L, 7L))
    val a = cc(edges)
    val b = ConnectedComponents.run(
      edges.toDF("src", "dst").repartition(7), "src", "dst")
      .as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(a(8L) == 3L && a(100L) == 7L)
  }
}
