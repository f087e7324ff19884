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

  /** Re-weight a corpus to a target mixture — the data-mixing step of
    * corpus assembly: down-sample each stratum so FINAL counts are
    * proportional to `weights`, keeping the maximum possible corpus
    * (the bottleneck stratum — the one most under target, min n/w —
    * keeps 100%; no stratum is ever up-sampled). Strata not listed in
    * `weights` are dropped: the mixture DEFINES the corpus.
    *
    * Membership is the stable md5 bucket at 1/10⁴ grain, so the sample
    * is append-stable (keep rates move as counts grow, but membership
    * at a given rate never re-rolls) and engine-portable. Keep rates
    * derive from exact integer counts with ONE mirrored double
    * division each, so the DuckDB oracle replays the identical sample;
    * realized counts are rate·n in expectation (hash-binomial, not
    * exact quotas — quotas would need a global sort).
    *
    * Plan: one column-pruned counts aggregate (≤ |weights| rows after
    * the inner join), a window over that bounded frame to find the
    * bottleneck, broadcast join back (bounded by the caller's literal
    * weight list), per-row hash filter. Two scans of `df` total — the
    * counts pass reads only `strataCol`. */
  def mixtureResample(df: DataFrame, keyCol: String, strataCol: String,
      weights: Seq[(String, Int)], salt: String = ""): DataFrame = {
    require(weights.nonEmpty, "need at least one stratum weight")
    require(weights.forall(_._2 > 0), "weights must be positive")
    require(weights.map(_._1).distinct.size == weights.size,
      "duplicate stratum in weights")
    val spark = df.sparkSession
    import spark.implicits._
    val w = weights.toDF(strataCol, "__wt")
    val counts = df.groupBy(col(strataCol)).agg(count(lit(1)).as("__n"))
      .join(w, strataCol) // inner: unlisted strata drop here
    // bottleneck = lexicographic min of (n/w, stratum): the struct min
    // mirrors the oracle's ORDER BY ratio, stratum LIMIT 1 — one window
    // over a ≤|weights|-row frame
    val bottleneck = min(struct(
      (col("__n").cast("double") / col("__wt")).as("r"),
      col(strataCol).as("s"), col("__n").as("n"), col("__wt").as("w")))
      .over(Window.partitionBy())
    val rates = counts
      .withColumn("__m", bottleneck)
      // keep_bp/10⁴ = (w_s·n_m)/(w_m·n_s): exact-integer ratio, one
      // double division, floor — bit-identical in the oracle; the
      // bottleneck itself lands on exactly 10⁴ (keeps everything)
      .select(col(strataCol),
        floor(lit(10000.0) * col("__wt") * col("__m.n") /
          (col("__m.w") * col("__n"))).cast("int").as("__keep_bp"))
    val bucket = (conv(substring(
      md5(concat(col(keyCol).cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long") % 10000).cast("int")
    df.join(broadcast(rates), strataCol)
      .filter(bucket < col("__keep_bp"))
      .drop("__keep_bp")
  }

  /** Temperature-resampled source mixture — the multilingual-corpus
    * balancing step (mC4 / XLM-R: sample stratum s with probability
    * ∝ n_s^α, α < 1 flattening the head so low-resource strata are
    * seen more often, REPEATING them when their quota exceeds their
    * size). Emits the full per-doc report: `n_copies` = how many
    * epochs of this document the mix contains (0 = dropped), with
    * Σ n_copies = `totalOut` EXACTLY — apportionment is
    * largest-remainder over exact integers, not expected-value hash
    * gating, because a training mix is a budget, not a rate.
    *
    * Exactness/portability: n_s^α is computed as a chain of IEEE-754
    * `sqrt` and one multiply (α ∈ {¼, ½, ¾} = `alphaQuarters`/4) —
    * sqrt and multiply are correctly-rounded ops, so Java and the
    * DuckDB oracle produce bit-identical doubles (ANY other pow is
    * libm territory and diverges in the last ulp). The weight is then
    * floored into integer space (×2²⁰) and everything downstream is
    * exact integer arithmetic: driver-side BigInt (overflow-free);
    * the SQL replay's BIGINT is safe while totalOut·Σw < 2⁶³.
    *
    * Scale shape: ONE column-pruned scan aggregates per-stratum
    * counts; that frame is bounded by the stratum vocabulary
    * (languages/sources — `maxStrata` guards the assumption and
    * THROWS rather than collect an unbounded frame), so the
    * largest-remainder walk happens driver-side on ≤`maxStrata` rows
    * — the [[Bpe]] bounded-model-collect pattern. Quotas broadcast
    * back as a literal frame; the only data-sized cost is one
    * row_number window per stratum for the fractional quota (an
    * exact per-stratum k-smallest-by-md5 selection is inherently a
    * per-stratum sort — same discipline and same skew caveat as
    * [[tokenBudgetSample]]'s per-source window; at 100 TB shard the
    * hot stratum by md5-prefix sub-quotas before this window). */
  def temperatureResample(df: DataFrame, keyCol: String, strataCol: String,
      totalOut: Long, alphaQuarters: Int = 2, salt: String = "",
      maxStrata: Int = 100000): DataFrame = {
    require(totalOut > 0, "totalOut must be positive")
    require(alphaQuarters >= 1 && alphaQuarters <= 3,
      s"alphaQuarters must be 1, 2 or 3 (alpha = quarters/4), got $alphaQuarters")
    val spark = df.sparkSession
    import spark.implicits._
    // null strata could never join back anyway (null ≠ null): drop them
    // here so the driver-side walk never sees a null key
    val counts = df.filter(col(strataCol).isNotNull)
      .groupBy(col(strataCol).cast("string").as("__s"))
      .agg(count(lit(1)).as("__n"))
      .limit(maxStrata + 1)
      .as[(String, Long)].collect()
    require(counts.length <= maxStrata,
      s"more than $maxStrata strata — this operator collects the stratum " +
        "table to the driver; raise maxStrata only if that is still bounded")
    require(counts.nonEmpty, "empty input")
    // n^alpha via correctly-rounded ops only (mirrored by the oracle)
    def pow(n: Long): Double = {
      val d = n.toDouble
      alphaQuarters match {
        case 1 => math.sqrt(math.sqrt(d))
        case 2 => math.sqrt(d)
        case 3 => math.sqrt(d) * math.sqrt(math.sqrt(d))
      }
    }
    val w = counts.map { case (s, n) => (s, n, math.floor(pow(n) * 1048576.0).toLong) }
    val bigW = w.map(x => BigInt(x._3)).sum
    require(bigW > 0, "all strata weights floored to zero")
    val withBase = w.map { case (s, n, wt) =>
      val prod = BigInt(totalOut) * wt
      (s, n, (prod / bigW).toLong, prod % bigW)
    }
    val leftover = totalOut - withBase.map(_._3).sum
    // largest remainder, stratum-name tiebreak (row_number semantics)
    val bumped = withBase.sortBy { case (s, _, _, rem) => (-rem, s) }(
      Ordering.Tuple2(Ordering[BigInt], Ordering[String]))
      .zipWithIndex
      .map { case ((s, n, base, _), i) =>
        (s, n, base + (if (i < leftover) 1L else 0L)) }
    val quotas = bumped.toSeq.map { case (s, n, q) =>
      (s, q / n, q % n) }.toDF(strataCol, "__base", "__extra")
    val rn = row_number().over(Window.partitionBy(col(strataCol))
      .orderBy(md5(concat(col(keyCol).cast("string"), lit(salt))).asc,
        col(keyCol).asc))
    df.join(broadcast(quotas), strataCol)
      .withColumn("__rn", rn)
      .select(col(keyCol), col(strataCol),
        (col("__base") + when(col("__rn") <= col("__extra"), 1L)
          .otherwise(0L)).as("n_copies"))
  }

  /** Token-budgeted mixture selection — the mechanical core of
    * pretraining-mix assembly: each source contributes documents, in a
    * deterministic md5 order, until its TOKEN budget is filled
    * ([[mixtureResample]] balances document counts; training mixes are
    * specified in tokens). A doc is kept iff the tokens BEFORE it in
    * its source's order sit under the budget, so each source overshoots
    * by at most one document (the [[Packing]] boundary convention) and
    * never silently under-fills. Unlisted sources get `defaultBudget`.
    *
    * Emits the full per-doc report — `n_tokens`, `cum_before`, `kept`
    * — rather than just survivors, so mix construction is auditable
    * (how close each source came to its budget is `max(cum_before +
    * n_tokens)` over kept rows).
    *
    * Determinism/portability: the order key is md5(key‖salt) with a
    * key tiebreak, the same construction as [[capPerGroup]], so the
    * selection is append-order-independent, re-roll-free under a salt
    * change only, and replayed exactly by the SQL oracle. Appending
    * docs CAN displace later-ordered ones (a budget is a corpus-level
    * quota, unlike the per-row hash gates above) — by construction,
    * since the budget stays fixed while candidates grow.
    *
    * Scale shape: one window per source partition (the budget is
    * inherently sequential per source — same discipline as
    * [[Packing.packByBudget]], whose groupCols carry the sharding);
    * the budget lookup is a literal CASE chain, no join. One shuffle
    * on the source key, skew bounded by the largest source's doc
    * count; at 100 TB shard sources further (e.g. source × md5-prefix
    * sub-budgets) before this window. */
  def tokenBudgetSample(df: DataFrame, keyCol: String, groupCol: String,
      tokens: Column, budgets: Seq[(String, Long)], defaultBudget: Long,
      salt: String = ""): DataFrame = {
    require(defaultBudget >= 0 && budgets.forall(_._2 >= 0),
      "budgets must be non-negative")
    require(budgets.map(_._1).distinct.size == budgets.size,
      "duplicate group in budgets")
    val ord = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(groupCol))
      .orderBy(ord.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val budget = budgets.foldLeft(lit(defaultBudget)) { case (acc, (g, b)) =>
      when(col(groupCol) === g, lit(b)).otherwise(acc)
    }
    // __-prefixed working names (the repairLeakage convention, r10
    // ADVICE #3): plain withColumn("n_tokens", ...) silently clobbered
    // an input column of that name (e.g. a frame re-run through this
    // operator) and built the report on the overwritten values
    df.withColumn("__tbs_n", tokens.cast("long"))
      .withColumn("__tbs_cum", coalesce(sum(col("__tbs_n")).over(w), lit(0L)))
      .select(col(keyCol), col(groupCol), col("__tbs_n").as("n_tokens"),
        col("__tbs_cum").as("cum_before"),
        (col("__tbs_cum") < budget).as("kept"))
  }

  /** Weighted SYSTEMATIC sample: exactly `n` draws per stratum with
    * inclusion probability proportional to an integer weight (token
    * counts — the "sample by data volume, not doc count" form), in
    * EXACT integer arithmetic. Rows order by md5(key‖salt) with the
    * key tiebreak (the [[capPerGroup]] construction — a deterministic
    * circular shuffle); a row with cumulative weight reaching
    * threshold multiples of W/n takes one copy per multiple crossed:
    * `n_copies = ⌊c_i·n/W⌋ − ⌊c_{i−1}·n/W⌋`. Σ n_copies = n exactly
    * per stratum (the largest-remainder discipline of
    * [[mixtureResample]], weight-proportional instead of
    * count-balanced); a row heavier than W/n can draw multiple copies
    * — systematic sampling's documented behavior, and the honest one
    * (its inclusion probability saturates). Zero-weight rows never
    * draw. All-integer: no pow/log portability seams, the oracle
    * replays bit-for-bit.
    *
    * Emits the full per-row report (weight, cum_before, n_copies) so
    * the draw is auditable; filter `n_copies > 0` for survivors.
    *
    * Scale shape: one window per stratum (the cumulative sum is
    * inherently sequential per stratum — the [[tokenBudgetSample]]
    * discipline; shard strata further before this window at 100 TB);
    * the per-stratum total joins back as a broadcast of ≤ |strata|
    * rows. */
  def weightedSystematic(df: DataFrame, keyCol: String, strataCol: String,
      weight: Column, n: Int, salt: String = ""): DataFrame = {
    require(n >= 1, "n must be >= 1")
    val ord = md5(concat(col(keyCol).cast("string"), lit(salt)))
    val w = Window.partitionBy(col(strataCol))
      .orderBy(ord.asc, col(keyCol).asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    val base = df.withColumn("__ws_w", weight.cast("long"))
    val totals = base.groupBy(col(strataCol))
      .agg(sum(col("__ws_w")).as("__ws_total"))
    base
      .join(broadcast(totals), Seq(strataCol))
      .withColumn("__ws_cum", coalesce(sum(col("__ws_w")).over(w), lit(0L)))
      // `div` (integer division), NOT `/` (double): thresholds must be
      // exact at any magnitude; an all-zero-weight stratum divides by
      // zero → null → 0 copies. The cum·n products compute in
      // DECIMAL(38,0), not LONG (r14 ADVICE #4): with token-count
      // weights, Σw·n can clear 2^63 at corpus scale and the Long form
      // silently wrapped (negative n_copies); 38 digits hold any
      // Σw ≤ 10^38/n — beyond any token count that can exist.
      .select(col(keyCol), col(strataCol),
        col("__ws_w").as("weight"),
        col("__ws_cum").as("cum_before"),
        coalesce(
          expr(s"(cast(__ws_cum + __ws_w as decimal(38,0)) * $n)" +
            " div cast(__ws_total as decimal(38,0))") -
            expr(s"(cast(__ws_cum as decimal(38,0)) * $n)" +
              " div cast(__ws_total as decimal(38,0))"),
          lit(0L)).as("n_copies"))
  }
}
