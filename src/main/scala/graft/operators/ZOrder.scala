package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton-curve) data layout: interleave the bits of two
  * dimension columns into one clustering key so that sorting/range-
  * partitioning by the key co-locates rows that are close in BOTH
  * dimensions at once. This is the standard multi-dimensional layout
  * technique behind file skipping at 100 TB: writing files in zkey
  * ranges gives every file tight min/max bounds on every interleaved
  * dimension, so a point/range predicate on EITHER column prunes most
  * files from the scan (a single-column sort only bounds one).
  *
  * Raw column values rarely fill their bit budget (a 0..31 day column
  * leaves 11 of 16 bits permanently zero, collapsing the curve), so —
  * like production Z-order implementations — dimensions are first
  * affine-scaled to [0, 2^bits) from their observed min/max. The
  * bounds come from one tiny 1-row aggregate joined in as a broadcast
  * scalar (the tf-idf N-docs shape — never a driver-side `.collect`),
  * and the scaling + interleave itself is pure 64-bit integer
  * shift/mask/OR algebra: codegen'd, per-row, engine-portable
  * (integral DIV on non-negatives — no float rounding anywhere).
  */
object ZOrder {

  /** Morton interleave of the low `bits` bits of x (even positions)
    * and y (odd positions): z = Σᵢ ((x>>i)&1)·2²ⁱ + ((y>>i)&1)·2²ⁱ⁺¹.
    * Inputs must already be scaled to [0, 2^bits). */
  def interleave(x: Column, y: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1,31], got $bits")
    val mask = (1L << bits) - 1
    val xm = x.cast("long").bitwiseAND(lit(mask))
    val ym = y.cast("long").bitwiseAND(lit(mask))
    (0 until bits).foldLeft(lit(0L)) { (acc, i) =>
      acc
        .bitwiseOR(shiftleft(shiftright(xm, i).bitwiseAND(lit(1L)), 2 * i))
        .bitwiseOR(shiftleft(shiftright(ym, i).bitwiseAND(lit(1L)), 2 * i + 1))
    }
  }

  /** Attach a range-scaled z-key column: per-dimension min/max from a
    * broadcast 1-row aggregate, each dimension mapped to its affine
    * grid, then Morton-interleaved into `zkey`. Two scans of the input
    * (one tiny agg + the keyed pass); at scale the bounds agg rides
    * existing table statistics instead.
    *
    * The grid is exact integral arithmetic with an overflow guard:
    * narrow ranges use (v − lo)·2^bits DIV span (finest cells — small
    * domains upscale to fill the bit budget), and ranges wider than
    * 2^(63−bits) — where that multiply would wrap — switch to
    * (v − lo) DIV ceil(span/2^bits), which handles any range whose
    * WIDTH fits a signed 64-bit long (a microsecond-timestamp
    * dimension works). A mixed-sign dimension spanning ≥ 2^63 (values
    * near both Long.MinValue and Long.MaxValue) has no representable
    * span and FAILS LOUDLY, never silently producing garbage z-keys:
    * under ANSI mode (the Spark 4 default, on in this session) the
    * hi − lo subtraction itself raises ARITHMETIC_OVERFLOW, and under
    * legacy non-ANSI configs — where the subtraction would wrap
    * negative — the guard branch raises instead. Either failure
    * matches the DuckDB twin's checked-subtraction error, so oracle
    * parity extends to the error case (r8 ADVICE #1). Both value
    * branches are replayed verbatim in the twin. */
  def withZKey(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8): DataFrame = {
    val bounds = broadcast(df.agg(
      min(col(xCol).cast("long")).as("__x_lo"),
      max(col(xCol).cast("long")).as("__x_hi"),
      min(col(yCol).cast("long")).as("__y_lo"),
      max(col(yCol).cast("long")).as("__y_hi")))
    val n = 1L << bits
    // spanM1 = hi − lo (range width − 1); wraps NEGATIVE when the true
    // span exceeds the signed-long domain → loud error, never garbage.
    // multiply-first is safe iff 0 ≤ spanM1 < 2^63 / 2^bits
    def grid(v: String, lo: String, hi: String): String =
      s"""CASE WHEN ($hi - $lo) < 0
         | THEN CAST(raise_error(
         |   'zorder: dimension span exceeds the signed 64-bit domain') AS BIGINT)
         | WHEN ($hi - $lo) < ${Long.MaxValue >> bits}
         | THEN (($v - $lo) * $n) DIV (($hi - $lo) + 1)
         | ELSE ($v - $lo) DIV ((($hi - $lo) DIV $n) + 1)
         | END""".stripMargin
    df.join(bounds)
      .withColumn("__xv", col(xCol).cast("long"))
      .withColumn("__yv", col(yCol).cast("long"))
      .withColumn("__xq", expr(grid("__xv", "__x_lo", "__x_hi")))
      .withColumn("__yq", expr(grid("__yv", "__y_lo", "__y_hi")))
      .withColumn("zkey", interleave(col("__xq"), col("__yq"), bits))
      .drop("__x_lo", "__x_hi", "__y_lo", "__y_hi", "__xv", "__yv",
        "__xq", "__yq")
  }

  /** Per-z-range layout statistics: cut the z-curve into `nBuckets`
    * fixed-width key ranges (top log₂ n bits of the 2·bits-bit key —
    * a stateless map, NOT an equi-depth window, so no single-partition
    * sort at scale) and report each range's row count and min/max
    * bounds on both dimensions. These bounds ARE the file-skipping
    * story: a reader probing `x = v` overlaps only the buckets whose
    * [x_min, x_max] contains v. One map-side-combined shuffle of
    * ≤ nBuckets rows. */
  def rangeStats(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, nBuckets: Int = 32): DataFrame = {
    require(Integer.bitCount(nBuckets) == 1 && nBuckets >= 2,
      s"nBuckets must be a power of two ≥ 2, got $nBuckets")
    val bucketBits = 63 - java.lang.Long.numberOfLeadingZeros(nBuckets.toLong)
    require(bucketBits <= 2 * bits, s"nBuckets=$nBuckets too fine for bits=$bits")
    withZKey(df, xCol, yCol, bits)
      .withColumn("bucket",
        shiftright(col("zkey"), 2 * bits - bucketBits).cast("int"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_rows"),
        min(col(xCol).cast("long")).as("x_min"),
        max(col(xCol).cast("long")).as("x_max"),
        min(col(yCol).cast("long")).as("y_min"),
        max(col(yCol).cast("long")).as("y_max"),
        min("zkey").as("z_min"),
        max("zkey").as("z_max"))
  }

  /** Range-partition the frame by its z-key — the layout write: each
    * output partition (→ file) covers one contiguous z-range, giving
    * it the tight two-dimensional min/max bounds [[rangeStats]]
    * measures. One range shuffle, the same cost as any sorted write. */
  def layoutByZ(df: DataFrame, xCol: String, yCol: String,
      bits: Int = 8, numPartitions: Int = 32): DataFrame =
    withZKey(df, xCol, yCol, bits)
      .repartitionByRange(numPartitions, col("zkey"))
      .sortWithinPartitions("zkey")
}
