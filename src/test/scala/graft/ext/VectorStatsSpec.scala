package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class VectorStatsSpec extends SparkSpec {
  import spark.implicits._

  private val vecs = Seq(
    (1L, "a", Seq(3.0f, 4.0f)),          // norm 5, max 4, mean 3.5
    (2L, "a", Seq(-1.0f, 1.0f)),         // norm √2, max 1, mean 0
    (3L, "b", Seq(0.0f, 0.0f)),          // zero vector: norm 0
    (4L, "b", Seq(6.0f, -8.0f))          // norm 10, max 8, mean -1
  ).toDF("vec_id", "label", "embedding")

  test("vectorStats: dim, 4-dp L2 norm, exact max|c| and micro-exact mean") {
    val out = VectorStats.vectorStats(vecs, "vec_id", "embedding")
      .as[(Long, Int, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 2, 5.0, 4.0, 3.5)))
    assert(out(2L)._3 == 1.4142 && out(2L)._4 == 1.0 && out(2L)._5 == 0.0)
    assert(out(3L) == ((3L, 2, 0.0, 0.0, 0.0)))
    assert(out(4L) == ((4L, 2, 10.0, 8.0, -1.0)))
  }

  test("vectorStats plans as a pure per-row pipeline: zero Exchange") {
    val plan = VectorStats.vectorStats(vecs, "vec_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"per-vector stats must not shuffle:\n$plan")
  }

  test("componentCentroids: exact per-(label, pos) means as scalar rows") {
    val out = VectorStats.componentCentroids(vecs, "label", "embedding")
      .as[(String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(out(("a", 0)) == 1.0 && out(("a", 1)) == 2.5)
    assert(out(("b", 0)) == 3.0 && out(("b", 1)) == -4.0)
    assert(out.size == 4)
  }

  test("componentCentroids is partitioning-invariant (order-independent sums)") {
    val base = VectorStats.componentCentroids(vecs, "label", "embedding")
    val shuffled = VectorStats.componentCentroids(
      vecs.repartition(7, col("vec_id")), "label", "embedding")
    assert(base.collect().toSet == shuffled.collect().toSet)
  }
}
