package graft.operators

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(edges.toDF("src", "dst"), "src", "dst", iters)
      .as[(Long, Long)].collect().toMap

  test("two triangles over a bridge settle into two communities") {
    // triangles {1,2,3} and {10,11,12}, bridge 3-10; the hand-computed
    // synchronous walk stabilizes at round 4: left labeled 1, right 3
    // (the right triangle's label is the BRIDGED node's round-1 vote —
    // deterministic, not the min node of the community)
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L),
      (10L, 11L), (11L, 12L), (10L, 12L),
      (3L, 10L))
    val out = lpa(edges, 5)
    assert(out == Map(
      1L -> 1L, 2L -> 1L, 3L -> 1L,
      10L -> 3L, 11L -> 3L, 12L -> 3L))
  }

  test("count ties break to the minimum label") {
    // star center 5 with leaves 7 and 9: one vote each, min wins
    val out = lpa(Seq((5L, 7L), (5L, 9L)), 1)
    assert(out(5L) == 7L)
    assert(out(7L) == 5L && out(9L) == 5L)
  }

  test("duplicate edges collapse to one vote; input is symmetrized") {
    // (1,3) twice + (1,2) once: collapsed, node 1 sees one vote each
    // for labels 2 and 3 — tie, min label 2 wins (uncollapsed, 3
    // would win 2:1). Leaves vote through the symmetrized reverse
    // edge even though input is directed.
    val out = lpa(Seq((1L, 3L), (1L, 3L), (1L, 2L)), 1)
    assert(out(1L) == 2L)
    assert(out(2L) == 1L && out(3L) == 1L)
  }

  test("isolated (self-loop-only) nodes keep their own id") {
    val out = lpa(Seq((1L, 2L), (20L, 20L)), 3)
    assert(out(20L) == 20L)
    assert(out.keySet == Set(1L, 2L, 20L))
  }

  test("synchronous rounds are deterministic under repartitioning") {
    val edges = Seq(
      (1L, 2L), (2L, 3L), (1L, 3L), (3L, 10L),
      (10L, 11L), (11L, 12L), (10L, 12L))
    val a = lpa(edges, 5)
    val b = LabelPropagation.run(
      edges.toDF("src", "dst").repartition(13), "src", "dst", 5)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }
}
