package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval (range) join: points `t` matched to intervals
  * `[lo, hi]` with `t BETWEEN lo AND hi`.
  *
  * Spark plans a raw BETWEEN join as BroadcastNestedLoopJoin — fine
  * when one side broadcasts, quadratic disaster otherwise. The scale
  * form used here is bucketing: quantize the axis into width-`w`
  * buckets, explode each interval into the buckets it covers, map each
  * point to its single bucket, equi-join on (keys…, bucket), then
  * filter the exact BETWEEN. Work becomes Σ per-bucket occupancy
  * products — the same Σ bucket² discipline as the dedup family — and
  * the join is a plain hash shuffle join AQE can handle.
  *
  * `w` trades replication for selectivity: each interval lands in
  * ⌈len/w⌉+1 buckets, each bucket sees points within w of an interval.
  * Pick w ≈ typical interval length (replication ≈ 2, candidates
  * tight). Degenerate long intervals replicate proportionally — cap or
  * split them upstream, exactly like hot shingles.
  */
object RangeJoin {

  /** Join `points` (with numeric axis `tCol`) to `intervals` (with
    * numeric `loCol`/`hiCol`), equi-matching on `keys` first, inner
    * semantics, exact `[lo, hi]` inclusive containment. All axis
    * columns must be integral (epoch days/seconds/micros — quantize
    * timestamps upstream). */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      tCol: String, loCol: String, hiCol: String,
      keys: Seq[String] = Nil, bucketWidth: Long = 16L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val p = points.withColumn("__bkt", floor(col(tCol) / w).cast("long"))
    val i = intervals.withColumn("__bkt",
      explode(sequence(floor(col(loCol) / w).cast("long"),
        floor(col(hiCol) / w).cast("long"))))
    p.join(i, keys :+ "__bkt")
      .filter(col(tCol) >= col(loCol) && col(tCol) <= col(hiCol))
      .drop("__bkt")
  }

  /** Interval×interval OVERLAP join: left intervals `[a_lo, a_hi]`
    * matched to right intervals `[b_lo, b_hi]` with
    * `a_lo ≤ b_hi AND b_lo ≤ a_hi` (closed, inclusive), equi-matching
    * on `keys` first — sessions×outage-windows, span×span
    * containment checks, any temporal-alignment audit.
    *
    * Same bucket discipline as [[pointInInterval]], with one
    * dedup twist: BOTH sides explode into covered buckets, so an
    * overlapping pair co-occurs in every bucket their intersection
    * covers — the exact predicate filters first, then duplicate
    * matches collapse by keeping only the bucket holding the
    * intersection's LOW end (`greatest(a_lo, b_lo)`), a stateless
    * per-row test instead of a distinct over the pair blowup. Work is
    * Σ per-bucket occupancy products; long intervals replicate
    * ⌈len/w⌉+1× — cap or split upstream, the hot-shingle rule. */
  def intervalOverlap(left: DataFrame, right: DataFrame,
      aLoCol: String, aHiCol: String, bLoCol: String, bHiCol: String,
      keys: Seq[String] = Nil, bucketWidth: Long = 16L): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val w = lit(bucketWidth)
    val a = left.withColumn("__bkt",
      explode(sequence(floor(col(aLoCol) / w).cast("long"),
        floor(col(aHiCol) / w).cast("long"))))
    val b = right.withColumn("__bkt",
      explode(sequence(floor(col(bLoCol) / w).cast("long"),
        floor(col(bHiCol) / w).cast("long"))))
    a.join(b, keys :+ "__bkt")
      .filter(col(aLoCol) <= col(bHiCol) && col(bLoCol) <= col(aHiCol))
      // emit each overlapping pair exactly once: only from the bucket
      // containing the intersection's low end
      .filter(col("__bkt") ===
        floor(greatest(col(aLoCol), col(bLoCol)) / w).cast("long"))
      .drop("__bkt")
  }
}
