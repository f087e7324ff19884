package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ZOrderSpec extends SparkSpec {
  import spark.implicits._

  // x=5 (101₂) fills even positions 0/2/4 → 10001₂ = 17;
  // y=3 (011₂) fills odd positions 1/3/5 → 01010₂ = 10; z = 27.
  test("interleave: hand-computed Morton value") {
    val z = Seq((5L, 3L)).toDF("x", "y")
      .select(ZOrder.interleave(col("x"), col("y"), 3)).as[Long].head()
    assert(z == 27L)
  }

  test("interleave is a bijection on the bits×bits grid") {
    val grid = (for { x <- 0 until 8; y <- 0 until 8 } yield (x.toLong, y.toLong))
      .toDF("x", "y")
    val zs = grid.select(ZOrder.interleave(col("x"), col("y"), 3).as("z"))
      .as[Long].collect()
    assert(zs.distinct.length == 64 && zs.min == 0L && zs.max == 63L)
  }

  // Grid fixture whose observed min/max are exactly 0..255, so the
  // affine scaling is the identity and every z value is predictable.
  private lazy val grid = (0 until 1000)
    .map(i => (i.toLong, (i * 7 % 256).toLong, (i * 13 % 256).toLong))
    .toDF("id", "x", "y")

  test("withZKey: identity scaling on a full-range fixture, key in [0, 2^16)") {
    val out = ZOrder.withZKey(grid, "x", "y", bits = 8)
    val (zs, expected) = (
      out.select("zkey").as[Long].collect(),
      grid.select(ZOrder.interleave(col("x"), col("y"), 8)).as[Long].collect())
    assert(zs.sorted.sameElements(expected.sorted))
    assert(zs.forall(z => z >= 0 && z < (1L << 16)))
  }

  test("withZKey: wide-range dimension (> 2^55) takes the overflow-proof branch") {
    // a multiply-first grid would wrap Long on this range; the cell-
    // width branch must keep keys valid and monotone in x
    val wide = Seq(0L, 1L << 40, 1L << 60, Long.MaxValue - 1)
      .zipWithIndex.map { case (x, i) => (i.toLong, x, 0L) }
      .toDF("id", "x", "y")
    val out = ZOrder.withZKey(wide, "x", "y", bits = 8)
      .orderBy("x").select("zkey").as[Long].collect()
    assert(out.forall(z => z >= 0 && z < (1L << 16)))
    assert(out.sameElements(out.sorted), "zkey must be monotone in x (y constant)")
    assert(out.distinct.length > 1, "extreme x values must land in different cells")
  }

  test("withZKey: mixed-sign span past 2^63 RAISES instead of wrapping to garbage keys") {
    // hi − lo wraps negative here; the guard must fail loudly (the
    // DuckDB twin's checked subtraction errors on the same input)
    val extreme = Seq((1L, Long.MinValue, 0L), (2L, Long.MaxValue, 1L))
      .toDF("id", "x", "y")
    // under ANSI mode (Spark 4 default) the subtraction itself raises
    // ARITHMETIC_OVERFLOW; with ANSI off the guard branch raises the
    // zorder message — either way the failure is loud, never garbage
    val e = intercept[Exception] {
      ZOrder.withZKey(extreme, "x", "y", bits = 8).collect()
    }
    def messages(t: Throwable): Seq[String] =
      if (t == null) Nil else Option(t.getMessage).toSeq ++ messages(t.getCause)
    assert(messages(e).exists(m =>
      m.contains("zorder: dimension span exceeds") || m.contains("ARITHMETIC_OVERFLOW")),
      s"wrong failure: $e")
  }

  test("rangeStats: buckets partition the key space with closed per-bucket bounds") {
    val stats = ZOrder.rangeStats(grid, "x", "y", bits = 8, nBuckets = 32)
      .as[(Int, Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(stats.map(_._2).sum == 1000L)
    stats.foreach { case (b, _, xMin, xMax, yMin, yMax, zMin, zMax) =>
      assert(b >= 0 && b < 32)
      // z-ranges are disjoint by construction: bucket = top 5 key bits
      assert(zMin >= (b.toLong << 11) && zMax < ((b.toLong + 1) << 11))
      assert(xMin <= xMax && yMin <= yMax)
    }
  }

  test("rangeStats bounds actually prune: a point-x probe overlaps a minority of buckets") {
    val stats = ZOrder.rangeStats(grid, "x", "y", bits = 8, nBuckets = 32)
      .select("x_min", "x_max").as[(Long, Long)].collect()
    val probed = stats.count { case (lo, hi) => lo <= 17L && 17L <= hi }
    // top-5-bit buckets pin x's two high bits → only ~¼ of buckets can
    // contain any given x value
    assert(probed <= stats.length / 2,
      s"x=17 overlapped $probed of ${stats.length} buckets — no pruning power")
  }

  test("layoutByZ: range-partitioned and sorted by zkey within partitions") {
    val laid = ZOrder.layoutByZ(grid, "x", "y", bits = 8, numPartitions = 8)
    assert(laid.rdd.getNumPartitions == 8)
    val perPartition = laid.select("zkey").rdd
      .mapPartitions(it => Iterator.single(it.map(_.getLong(0)).toSeq))
      .collect()
    perPartition.foreach(zs => assert(zs == zs.sorted, "partition not z-sorted"))
    // contiguous, non-overlapping z-ranges across partitions
    val nonEmpty = perPartition.filter(_.nonEmpty).toSeq
    nonEmpty.sliding(2).foreach {
      case Seq(a, b) => assert(a.last <= b.head, "partition z-ranges overlap")
      case _         =>
    }
  }
}
