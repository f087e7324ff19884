package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  private val points = Seq(
    ("A", 1L, 1.0), ("A", 5L, 2.0), ("A", 9L, 3.0), ("A", 10L, 4.0),
    ("B", 5L, 5.0), ("A", 40L, 6.0)
  ).toDF("k", "t", "v")

  private val intervals = Seq(
    ("A", 5L, 9L),    // catches A@5, A@9 (inclusive both ends)
    ("A", 0L, 100L),  // long interval spanning many buckets
    ("B", 0L, 4L)     // wrong-key / out-of-range guard
  ).toDF("k", "lo", "hi")

  test("bucketed interval join equals the naive BETWEEN join for any bucket width") {
    val naive = points.join(intervals,
        points("k") === intervals("k") &&
          col("t") >= col("lo") && col("t") <= col("hi"))
      .select(points("k"), col("t"), col("lo"), col("hi"))
      .as[(String, Long, Long, Long)].collect().sorted.toSeq
    for (w <- Seq(1L, 3L, 16L, 1000L)) {
      val bucketed = RangeJoin.pointInInterval(points, intervals,
          "t", "lo", "hi", keys = Seq("k"), bucketWidth = w)
        .select("k", "t", "lo", "hi")
        .as[(String, Long, Long, Long)].collect().sorted.toSeq
      assert(bucketed == naive, s"bucketWidth $w diverged from BETWEEN semantics")
    }
  }

  test("bucketed form plans a hash join, not a nested loop") {
    val plan = RangeJoin.pointInInterval(points, intervals,
        "t", "lo", "hi", keys = Seq("k"), bucketWidth = 8L)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("BroadcastNestedLoopJoin"),
      s"range join degenerated to a nested loop:\n$plan")
    assert(plan.contains("Join") || plan.contains("join"), plan)
  }

  private val leftIv = Seq(
    ("A", 1L, 4L), ("A", 5L, 30L), ("A", 31L, 31L), ("B", 1L, 4L)
  ).toDF("k", "a_lo", "a_hi")
  private val rightIv = Seq(
    ("A", 4L, 6L),    // touches [1,4] at 4 (inclusive) AND [5,30]
    ("A", 10L, 90L),  // long: overlaps [5,30] across many buckets, [31,31]
    ("B", 5L, 9L)     // key match but disjoint from B's [1,4]
  ).toDF("k", "b_lo", "b_hi")

  test("intervalOverlap equals the naive overlap join for any bucket width, pairs once") {
    val naive = leftIv.join(rightIv, Seq("k"))
      .filter(col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("k", "a_lo", "a_hi", "b_lo", "b_hi")
      .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
    assert(naive.nonEmpty && naive.size == naive.distinct.size)
    for (w <- Seq(1L, 3L, 16L, 1000L)) {
      val bucketed = RangeJoin.intervalOverlap(leftIv, rightIv,
          "a_lo", "a_hi", "b_lo", "b_hi", keys = Seq("k"), bucketWidth = w)
        .select("k", "a_lo", "a_hi", "b_lo", "b_hi")
        .as[(String, Long, Long, Long, Long)].collect().sorted.toSeq
      assert(bucketed == naive,
        s"bucketWidth $w diverged (duplicate or missing pairs)")
    }
  }
}
