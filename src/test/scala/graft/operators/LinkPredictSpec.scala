package graft.operators

import graft.SparkSpec

/** Hand-computable link-prediction fixtures: path endpoints, square
  * diagonals, clique saturation (no candidates), and the adjacency
  * exclusion.
  */
class LinkPredictSpec extends SparkSpec {
  import spark.implicits._

  private def predict(edges: Seq[(Long, Long)]) =
    LinkPredict.topK(edges.toDF("s", "d"), "s", "d")
      .select("node_a", "node_b", "common_neighbors", "jaccard")
      .as[(Long, Long, Long, Double)].collect().toSet

  test("path a-b-c: the endpoints are each other's only candidate at jaccard 1") {
    assert(predict(Seq((1L, 2L), (2L, 3L))) == Set((1L, 3L, 1L, 1.0)))
  }

  test("square: both diagonals, two common neighbors, jaccard 1") {
    val sq = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L))
    assert(predict(sq) == Set((1L, 3L, 2L, 1.0), (2L, 4L, 2L, 1.0)))
  }

  test("K4 is saturated: no non-adjacent pair to predict") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    assert(predict(k4).isEmpty)
  }

  test("shared-neighbor pairs that are already edges never appear") {
    // triangle + pendant: (1,3) share 2 but are adjacent; only the
    // pendant's two-hop pairs surface
    val g = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
    val out = predict(g)
    // pendant 4 reaches 1 and 2 through 3: cn=1, deg(4)=1, deg(1)=2
    // → j = 1/(1+2−1) = 0.5; the adjacent (1,3) pair (cn=1 via 2)
    // must NOT appear
    assert(out == Set((1L, 4L, 1L, 0.5), (2L, 4L, 1L, 0.5)))
  }

  test("top-k truncates per node under (jaccard, cn, id) order") {
    // star: every leaf pair shares the hub; 10 leaves → 9 candidates
    // per leaf, all jaccard 1.0 — k=5 keeps ids 1..5-ish per node_a
    val star = (1L to 10L).map(i => (0L, i))
    val out = LinkPredict.topK(star.toDF("s", "d"), "s", "d", k = 5)
    import org.apache.spark.sql.functions._
    val counts = out.groupBy("node_a").count()
      .select("count").as[Long].collect()
    assert(counts.forall(_ <= 5L))
    assert(out.filter(col("rank") > 5).count() == 0L)
  }
}
