package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computable coreness fixtures for the iterated-h-index k-core:
  * K4 plus a tail (core 3 vs 1), a cycle (uniformly 2), a star
  * (uniformly 1), robustness to duplicate/reversed edges, and — the
  * fixed-round contract's safety net — a fixpoint assertion on the
  * catalog's knn graph shape (extra rounds change nothing).
  */
class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def core(edges: Seq[(Long, Long)], iters: Int = 8): Map[Long, Long] =
    KCore.coreness(edges.toDF("s", "d"), "s", "d", iterations = iters)
      .as[(Long, Long)].collect().toMap

  test("K4 with a pendant tail: clique nodes 3, tail path 1") {
    val k4 = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val tail = Seq((3L, 4L), (4L, 5L))
    assert(core(k4 ++ tail) ==
      Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 1L, 5L -> 1L))
  }

  test("cycle: every node coreness 2") {
    val cycle = (0L to 5L).map(i => (i, (i + 1) % 6))
    assert(core(cycle) == (0L to 5L).map(_ -> 2L).toMap)
  }

  test("star: hub and leaves all coreness 1") {
    val star = (1L to 30L).map(i => (0L, i))
    val c = core(star)
    assert(c.size == 31 && c.values.forall(_ == 1L))
  }

  test("two K4s bridged by an edge: bridge does not inflate the core") {
    val a = for (i <- 0L to 3L; j <- 0L to 3L if i < j) yield (i, j)
    val b = for (i <- 10L to 13L; j <- 10L to 13L if i < j) yield (i, j)
    val c = core(a ++ b ++ Seq((3L, 10L)))
    assert(c.values.forall(_ == 3L) && c.size == 8)
  }

  test("duplicate and reversed edges collapse before the degree start") {
    val messy = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 1L), (1L, 3L),
      (1L, 2L), (2L, 2L))
    assert(core(messy) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L))
  }

  test("fixed 8-round cap is slack on the catalog knn graph: 8 ≡ 12 rounds") {
    val dir = "/root/testdata/sf0.001"
    val g = graft.ext.Similarity.knnGraph(
        graft.Tables.embeddings(spark, dir), "vec_id", "embedding",
        "label", k = 3)
      .select("vec_id", "neighbor_id")
    val at8 = KCore.coreness(g, "vec_id", "neighbor_id", iterations = 8)
    val at12 = KCore.coreness(g, "vec_id", "neighbor_id", iterations = 12)
    assert(at8.except(at12).isEmpty && at12.except(at8).isEmpty)
    // sanity: the knn graph is not degenerate — some node exceeds core 1
    assert(at8.agg(max(col("coreness"))).head.getLong(0) >= 2L)
  }
}
