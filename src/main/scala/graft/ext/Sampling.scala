package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling for corpus construction.
  *
  * `df.sample()` re-rolls membership on every re-read/retry — useless
  * for reproducible training sets. Everything here keys membership on
  * a cryptographic hash of a ROW KEY (the [[Splits]] discipline):
  * per-row, codegen'd, no shuffle (except the per-group cap, one
  * window shuffle), identical on any cluster size, and engine-portable
  * so the DuckDB oracle replays the exact sample.
  */
object Sampling {

  /** Keep ~pct% of rows: md5-bucket(key‖salt) < pct. Stable under
    * re-read, repartition, and append (existing rows never move). */
  def hashSample(df: DataFrame, keyCol: String, pct: Int,
      salt: String = ""): DataFrame = {
    require(pct >= 0 && pct <= 100, "pct must be in [0, 100]")
    df.filter(Splits.hashBucket(col(keyCol), salt) < pct)
  }

  /** Stratified rates: keep ~pct_s% per stratum (e.g. downsample the
    * dominant language, keep all of the rare ones — the corpus
    * re-balancing step). `rates` maps stratum value → percent; strata
    * not listed get `defaultPct`. Per-row CASE over the same stable
    * bucket — no shuffle, no per-stratum pass. */
  def stratified(df: DataFrame, keyCol: String, strataCol: String,
      rates: Seq[(String, Int)], defaultPct: Int,
      salt: String = ""): DataFrame = {
    require((defaultPct +: rates.map(_._2)).forall(p => p >= 0 && p <= 100),
      "every rate must be in [0, 100]")
    val rate = rates.foldLeft(lit(defaultPct)) { case (acc, (value, pct)) =>
      when(col(strataCol) === value, lit(pct)).otherwise(acc)
    }
    df.filter(Splits.hashBucket(col(keyCol), salt) < rate)
  }

  /** Cap each group at `k` rows, keeping the k smallest
    * md5(key‖salt) — a "consistent sample" per group (the balancing
    * cap on over-represented sources/domains). Deterministic for a
    * given dataset: the hash order is data-independent, so reruns and
    * repartitions pick the SAME k rows. One window shuffle on
    * `groupCols`; for pathological single-group skew, salt the group
    * upstream or pre-filter with [[hashSample]]. */
  def capPerGroup(df: DataFrame, groupCols: Seq[String], keyCol: String,
      k: Int, salt: String = ""): DataFrame = {
    require(k > 0, "k must be positive")
    val order = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(order.asc, col(keyCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
