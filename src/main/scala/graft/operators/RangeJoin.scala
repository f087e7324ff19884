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
}
