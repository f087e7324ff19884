package graft.operators

import graft.SparkSpec

/** Hand-computable fixtures for the degree-oriented triangle count:
  * K4 (every node in C(3,2) = 3 triangles), a triangle with a pendant
  * (pendant in 0), a star (0 everywhere), and duplicate/reversed edge
  * robustness.
  */
class TriangleCountSpec extends SparkSpec {
  import spark.implicits._

  private def count(edges: Seq[(Long, Long)]): Map[Long, Long] =
    TriangleCount.perNode(edges.toDF("s", "d"), "s", "d")
      .as[(Long, Long)].collect().toMap

  test("K4: four triangles, each node in exactly three") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(count(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L))
  }

  test("triangle with a pendant: pendant sees none") {
    assert(count(Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))) ==
      Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 0L))
  }

  test("star: hub has every edge, zero triangles — no last-reducer blowup") {
    val star = (1L to 50L).map(i => (0L, i))
    val c = count(star)
    assert(c.size == 51 && c.values.forall(_ == 0L))
  }

  test("duplicate and reversed edges collapse before counting") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (1L, 2L), (2L, 2L))
    assert(count(messy) == Map(1L -> 1L, 2L -> 1L, 3L -> 1L))
  }
}
