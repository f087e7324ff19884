package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-profiling operators: the "what does this column look like"
  * pass a pipeline runs before committing to thresholds (quality
  * cutoffs, outlier clips, bucket boundaries).
  *
  * Everything here is one hash-shuffle with map-side partial
  * aggregation — the only shapes that survive a 100 TB profiling scan.
  * No reference analog (the reference's aggregates stop at
  * mean/count/max, `transform_fred_data.py:124-128`); these are the
  * EXT profiling surface.
  */
object Profile {

  /** Fixed-width histogram of `value` per group: bucket `-1` catches
    * underflow (< lo), bucket `nBuckets` overflow (>= hi), interior
    * bucket i covers [lo + i·w, lo + (i+1)·w) with w = (hi−lo)/n.
    *
    * The bucket index is pure per-row arithmetic (`floor((v−lo)/w)`),
    * so the whole operator is a map-side-combined count shuffle of at
    * most |groups|·(n+2) rows — the scale-safe histogram. Only
    * non-empty buckets are emitted. The same IEEE arithmetic runs in
    * the DuckDB oracle, so bucket assignment is bit-identical even for
    * values landing on edges.
    */
  def histogram(df: DataFrame, groupCols: Seq[String], value: Column,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need hi > lo and nBuckets > 0")
    val w = (hi - lo) / nBuckets
    val bucket = when(value < lo, lit(-1))
      .when(value >= hi, lit(nBuckets))
      .otherwise(floor((value - lit(lo)) / lit(w)).cast("int"))
    df.withColumn("bucket", bucket)
      .groupBy((groupCols.map(col) :+ col("bucket")): _*)
      .agg(count(lit(1)).as("n"))
      .withColumn("bucket_lo", lit(lo) + col("bucket") * lit(w))
  }

  /** Winsorization (outlier clipping): clamp `value` to its per-group
    * [pLo, pHi] exact percentiles — the standard pre-training numeric
    * hygiene step. Percentiles are computed over micro-scaled BIGINTs
    * (exact interpolation, oracle-portable — see Queries.aggQuantiles;
    * keep pLo/pHi at .25-style binary-exact fractions for hash-checked
    * use). The bounds frame is |groups| rows; no broadcast hint is
    * attached — `groupCols` is caller-chosen, so |groups| is unbounded
    * (per-domain winsorization over a web crawl is tens of millions of
    * groups) and a forced broadcast would be a driver-OOM hazard. AQE
    * broadcasts the clamp join at runtime whenever the measured bounds
    * frame fits under `spark.sql.autoBroadcastJoinThreshold`, which is
    * every catalog-scale use; above that it degrades to a sort-merge
    * join instead of failing.
    *
    * At 100 TB swap the exact `percentile` for `approx_percentile` —
    * same plan shape, sketch-mergeable partials instead of a holistic
    * sort — and accept a rows-only check (estimator interpolation is
    * engine-specific).
    */
  def winsorize(df: DataFrame, groupCols: Seq[String], valueCol: String,
      pLo: Double, pHi: Double): DataFrame = {
    require(pLo >= 0 && pHi <= 1 && pLo < pHi, "need 0 <= pLo < pHi <= 1")
    val bounds = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        (percentile(round(col(valueCol) * 1e6).cast("long"), lit(pLo)) / 1e6)
          .as("__lo"),
        (percentile(round(col(valueCol) * 1e6).cast("long"), lit(pHi)) / 1e6)
          .as("__hi"))
    df.join(bounds, groupCols) // no hint: AQE decides (see scaladoc)
      .withColumn(valueCol + "_w",
        least(greatest(col(valueCol), col("__lo")), col("__hi")))
      .drop("__lo", "__hi")
  }
}
