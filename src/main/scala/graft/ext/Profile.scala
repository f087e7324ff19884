package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
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

  /** Exact per-group second moments (mean, sample variance, sample
    * stddev) over a 2-dp value column. Inputs are cents-scaled to exact
    * BIGINTs and the power sums accumulate as DECIMAL(38,0), so the
    * moments are order-independent and bit-identical in the DuckDB
    * oracle (a naive `stddev(x)` differs per summation order). One
    * map-side-combined shuffle of three partials per group — the same
    * shape at 100 TB, where the decimal accumulator is also the
    * overflow-proof path (Σx² over 10¹² cents-scaled rows exceeds
    * BIGINT but sits far below 10³⁸). The cast to DECIMAL happens
    * BEFORE the square and BEFORE the sum: `x² ` in LongType would
    * silently wrap (non-ANSI) for |x| above ~3·10⁹ cents while the
    * DuckDB oracle multiplies in HUGEINT, and Σx in LongType can wrap
    * on enough rows. Squaring in decimal(38,0) is exact at scale 0 and
    * overflows to NULL — loud, not wrong — if a value ever exceeds
    * 10¹⁹ cents.
    *
    * var = (n·Σx² − (Σx)²) / (n·(n−1)), computed on exact integers and
    * converted to double once at the end (a single correctly-rounded
    * conversion per engine). Groups with n = 1 get null variance.
    */
  def moments(df: DataFrame, groupCols: Seq[String], value: Column): DataFrame = {
    val dec = "decimal(38,0)"
    val xd = round(value * 100).cast("long").cast(dec)
    val agged = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast(dec).as("__s1"),
        sum(xd * xd).cast(dec).as("__s2"))
    val num = col("n").cast(dec) * col("__s2") - col("__s1") * col("__s1")
    val den = (col("n") * (col("n") - 1)).cast("double")
    val varUnits = num.cast("double") / den / 1e4 // cents² → units²
    agged
      .withColumn("mean", col("__s1").cast("double") / col("n") / 1e2)
      // integer-scaled 4-dp rounding — see Queries (round(v·10⁴)/10⁴)
      .withColumn("var_samp",
        when(col("n") > 1, round(num.cast("double") / den) / 1e4))
      .withColumn("stddev_samp",
        when(col("n") > 1, round(sqrt(varUnits) * lit(10000.0)) / 1e4))
      .drop("__s1", "__s2")
  }

  /** Exact per-group Pearson correlation of two 2-dp numeric columns,
    * via the same cents-scaled DECIMAL power-sum discipline as
    * [[moments]]: one shuffle of five integer partials, a closed-form
    * ratio at the end, 4-dp integer-scaled rounding. Groups where
    * either side is constant (zero denominator) get null.
    */
  def pearsonCorr(df: DataFrame, groupCols: Seq[String],
      xCol: Column, yCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // decimal BEFORE square/sum — see moments for the overflow rationale
    val xd = round(xCol * 100).cast("long").cast(dec)
    val yd = round(yCol * 100).cast("long").cast(dec)
    val agged = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast(dec).as("__sx"),
        sum(yd).cast(dec).as("__sy"),
        sum(xd * xd).cast(dec).as("__sxx"),
        sum(yd * yd).cast(dec).as("__syy"),
        sum(xd * yd).cast(dec).as("__sxy"))
    val nD = col("n").cast(dec)
    val cov = nD * col("__sxy") - col("__sx") * col("__sy")
    val vx = nD * col("__sxx") - col("__sx") * col("__sx")
    val vy = nD * col("__syy") - col("__sy") * col("__sy")
    agged
      .withColumn("corr",
        when(vx > 0 && vy > 0,
          // + 0.0 drops IEEE negative zero (engine round() sign differs)
          round(cov.cast("double") /
            (sqrt(vx.cast("double")) * sqrt(vy.cast("double"))) * lit(10000.0)) / 1e4 + lit(0.0)))
      .drop("__sx", "__sy", "__sxx", "__syy", "__sxy")
  }

  /** Declarative data-quality expectations (the Deequ-style validation
    * gate): each rule is a named boolean predicate; the output is one
    * row per rule with violation counts — a null predicate counts as a
    * violation (unknown is not a pass). ALL rules evaluate in ONE scan
    * with a single 1-row aggregate (no per-rule passes), then unfold
    * to rows; violation shares use integer-scaled rounding. */
  def expectations(df: DataFrame, rules: Seq[(String, Column)]): DataFrame = {
    require(rules.nonEmpty, "need at least one rule")
    val sums = rules.zipWithIndex.map { case ((_, pred), i) =>
      sum(when(coalesce(pred, lit(false)), 0L).otherwise(1L)).as(s"__v$i")
    }
    val agged = df.agg(count(lit(1)).as("n_rows"), sums: _*)
    val entries = rules.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(name).as("rule"), col(s"__v$i").as("n_violations"))
    }
    agged
      .select(col("n_rows"), explode(array(entries: _*)).as("x"))
      .select(col("x.rule").as("rule"), col("x.n_violations").as("n_violations"),
        col("n_rows"),
        // integer-scaled rounding — see TextOps.qualitySignals
        (round(col("x.n_violations") * lit(10000.0) / col("n_rows")) / 1e4)
          .as("violation_pct"))
  }

  /** Merge per-batch [[expectations]] reports into one corpus-level
    * report: violation counts and row counts are additive, so
    * incremental validation (micro-batches via `foreachBatch`, or
    * per-partition-of-the-lake runs) composes exactly to the
    * whole-corpus result — the property that lets a 100 TB validation
    * run as many small scans instead of one monolith (spec-pinned). */
  def mergeExpectationReports(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "need at least one report")
    reports.reduce(_.unionByName(_))
      .groupBy("rule")
      .agg(sum("n_violations").as("n_violations"), sum("n_rows").as("n_rows"))
      .withColumn("violation_pct",
        round(col("n_violations") * lit(10000.0) / col("n_rows")) / 1e4)
  }

  /** Per-column profiling summary in ONE pass: null count and exact
    * distinct count per listed column, one output row per column.
    * Multiple count-distincts compile to a single Expand-based
    * aggregate — |cols|× the scan rows through one shuffle, the
    * standard profiler trade (swap in approx_count_distinct at 100 TB
    * for sketch partials and accept rows-only checks). */
  def columnProfile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        countDistinct(col(c)).as(s"__d_$c"))
    }
    val agged = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_nulls"),
        col(s"__d_$c").as("n_distinct"))
    }
    agged
      .select(col("n_rows"), explode(array(entries: _*)).as("x"))
      .select(col("x.column").as("column"), col("x.n_nulls").as("n_nulls"),
        col("x.n_distinct").as("n_distinct"), col("n_rows"))
  }

  /** The 100 TB form of [[columnProfile]]: HyperLogLog++ sketches
    * replace exact distinct counts — partials are constant-memory and
    * mergeable, so the profile is one ordinary map-side-combined pass
    * with NO Expand multiplication of the scan. Rows-only at the
    * oracle gate (estimator is engine-specific); ProfileAndSamplingSpec
    * pins the rsd error bound against the exact twin. */
  def columnProfileApprox(df: DataFrame, cols: Seq[String],
      rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "need at least one column")
    val aggs = cols.flatMap { c =>
      Seq(sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"__n_$c"),
        approx_count_distinct(col(c), rsd).as(s"__d_$c"))
    }
    val agged = df.agg(count(lit(1)).as("n_rows"), aggs: _*)
    val entries = cols.map { c =>
      struct(lit(c).as("column"), col(s"__n_$c").as("n_nulls"),
        col(s"__d_$c").as("n_distinct_approx"))
    }
    agged
      .select(col("n_rows"), explode(array(entries: _*)).as("x"))
      .select(col("x.column").as("column"), col("x.n_nulls").as("n_nulls"),
        col("x.n_distinct_approx").as("n_distinct_approx"), col("n_rows"))
  }

  /** Per-group z-score standardization: z = (x − mean)/stddev with the
    * mean and (sample) stddev derived from the same exact cents-scaled
    * DECIMAL power sums as [[moments]] — the stats frame is |groups|
    * rows (AQE broadcasts the join; data side never shuffles) and
    * every IEEE step from the integer sums to z is mirrored
    * operation-for-operation in the oracle. Constant groups (zero
    * variance) and single-row groups get null. 4-dp integer-scaled
    * rounding on z. */
  def zscore(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val dec = "decimal(38,0)"
    // decimal BEFORE square/sum — see moments for the overflow rationale
    val xd = round(col(valueCol) * 100).cast("long").cast(dec)
    val stats = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("__n"),
        sum(xd).cast(dec).as("__s1"),
        sum(xd * xd).cast(dec).as("__s2"))
    val num = col("__n").cast(dec) * col("__s2") - col("__s1") * col("__s1")
    val mean = col("__s1").cast("double") / col("__n") / 1e2
    val std = sqrt(num.cast("double") /
      (col("__n") * (col("__n") - 1)).cast("double") / 1e4)
    df.join(stats, groupCols) // no hint: AQE decides (see winsorize)
      .withColumn("zscore",
        when(col("__n") > 1 && num > 0,
          round((col(valueCol) - mean) / std * lit(10000.0)) / 1e4))
      .drop("__n", "__s1", "__s2")
  }

  /** Per-group ordinary-least-squares line y = slope·x + intercept —
    * closed form over the SAME five cents-scaled DECIMAL power sums as
    * [[pearsonCorr]] (one shuffle, exact integers; the scale factor
    * cancels in the slope and divides out of the intercept). The trend
    * estimator behind drift detection. Constant-x groups get nulls.
    * The intercept chain reuses the UNROUNDED slope and descales last —
    * mirrored operation-for-operation in the oracle so every IEEE step
    * is identical. */
  def linearFit(df: DataFrame, groupCols: Seq[String],
      xCol: Column, yCol: Column): DataFrame = {
    val dec = "decimal(38,0)"
    // decimal BEFORE square/sum — see moments for the overflow rationale
    val xd = round(xCol * 100).cast("long").cast(dec)
    val yd = round(yCol * 100).cast("long").cast(dec)
    val agged = df
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n"),
        sum(xd).cast(dec).as("__sx"),
        sum(yd).cast(dec).as("__sy"),
        sum(xd * xd).cast(dec).as("__sxx"),
        sum(xd * yd).cast(dec).as("__sxy"))
    val nD = col("n").cast(dec)
    val cov = nD * col("__sxy") - col("__sx") * col("__sy")
    val vx = nD * col("__sxx") - col("__sx") * col("__sx")
    val slope = cov.cast("double") / vx.cast("double")
    val intercept =
      (col("__sy").cast("double") - slope * col("__sx").cast("double")) /
        col("n") / 1e2
    agged
      .withColumn("slope",
        // + 0.0 drops IEEE negative zero (engine round() sign differs)
        when(vx > 0, round(slope * lit(10000.0)) / 1e4 + lit(0.0)))
      .withColumn("intercept",
        when(vx > 0, round(intercept * lit(10000.0)) / 1e4 + lit(0.0)))
      .drop("__sx", "__sy", "__sxx", "__sxy")
  }

  /** Median absolute deviation per group — the robust scale estimate
    * (immune to the outliers that wreck stddev) behind robust
    * z-scoring. Two exact medians: median of the micro-scaled values,
    * then median of |x − m|. Medians interpolate at most halfway
    * between two integers, so everything stays exact in HALF-micro
    * units (2x₆ and round(2m) are integers) and both engines descale
    * with single correctly-rounded IEEE divisions — hash-exact.
    *
    * Plan: two holistic `percentile` shuffles plus the deviation join
    * (AQE broadcasts the |groups|-row medians frame). At 100 TB swap
    * both percentiles for `approx_percentile` — same shape, sketch
    * partials — and accept a rows-only check.
    */
  def mad(df: DataFrame, groupCols: Seq[String], valueCol: String): DataFrame = {
    val x6 = round(col(valueCol) * 1e6).cast("long")
    val med = df.groupBy(groupCols.map(col): _*)
      .agg(percentile(x6, lit(0.5)).as("__m6"))
    df.join(med, groupCols) // no hint: AQE decides (see winsorize)
      .withColumn("__d2", abs(x6 * 2 - round(col("__m6") * 2).cast("long")))
      .groupBy(groupCols.map(col): _*)
      .agg(
        // min of a per-group constant — engine-neutral (vs first/any)
        min(col("__m6") / 1e6).as("median"),
        (percentile(col("__d2"), lit(0.5)) / 2e6).as("mad"))
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

  /** Per-group min–max normalization of a 2-dp value column to [0, 1]
    * — the feature-scaling sibling of [[zscore]], same plan: one
    * cents-scaled min/max aggregate, AQE-decided join back, NULL for
    * constant groups (zero range). The normalized value is an exact
    * integer ratio ((x−min)·10⁴ / (max−min) in cents, one double
    * division + 0-dp round) so the oracle is bit-identical. */
  def minmaxScale(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val xc = round(col(valueCol) * 100).cast("long")
    val stats = df.groupBy(groupCols.map(col): _*)
      .agg(min(xc).as("__mn"), max(xc).as("__mx"))
    df.join(stats, groupCols) // no hint: AQE decides (see winsorize)
      .withColumn("minmax",
        when(col("__mx") > col("__mn"),
          round((xc - col("__mn")) * lit(10000.0) /
            (col("__mx") - col("__mn"))) / 1e4))
      .drop("__mn", "__mx")
  }

  /** Distribution drift per group: Pearson's χ² of the group's
    * fixed-bucket histogram (the [[histogram]] bucket law) against the
    * whole corpus — the train/serve skew and per-source drift detector.
    *
    * One map-side-combined count shuffle over `df`; every marginal
    * (per-bucket, per-group, grand total) is a window over the COUNTS
    * frame, which is ≤ |groups|·(nBuckets+2) rows no matter how big
    * `df` is — the raw data is scanned exactly once. χ² = Σ(o−e)²/e
    * with e = n_g·N_b/N telescopes to Σ o²·N/(n_g·N_b) − n_g, so empty
    * cells contribute nothing and no group×bucket grid is built. Each
    * term is a ratio of exact integers (DECIMAL numerator, one double
    * division, 0-dp round) summed as longs — order-free, oracle
    * bit-identical. */
  def driftChiSquare(df: DataFrame, groupCol: String, value: Column,
      lo: Double, hi: Double, nBuckets: Int): DataFrame = {
    require(nBuckets > 0 && hi > lo, "need hi > lo and nBuckets > 0")
    val dec = "decimal(38,0)"
    val w = (hi - lo) / nBuckets
    val bucket = when(value < lo, lit(-1))
      .when(value >= hi, lit(nBuckets))
      .otherwise(floor((value - lit(lo)) / lit(w)).cast("int"))
    val counts = df.withColumn("__b", bucket)
      .groupBy(col(groupCol), col("__b"))
      .agg(count(lit(1)).as("__o"))
    val withMarginals = counts
      .withColumn("__nb", sum("__o").over(Window.partitionBy("__b")))
      .withColumn("__ng", sum("__o").over(Window.partitionBy(groupCol)))
      .withColumn("__N", sum("__o").over(Window.partitionBy()))
    val term = round(
      (col("__o").cast(dec) * col("__o") * col("__N") * lit(10000))
        .cast("double") /
        (col("__ng").cast(dec) * col("__nb")).cast("double")).cast("long")
    withMarginals
      .withColumn("__t", term)
      .groupBy(col(groupCol))
      .agg(max("__ng").as("n"), sum("__t").as("__st"))
      .withColumn("chi_square",
        (col("__st") - col("n") * lit(10000L)).cast("double") / lit(1e4))
      .drop("__st")
  }

  /** Curation-funnel report: for an ORDERED chain of filter stages,
    * how many rows enter and survive each stage — the observability
    * companion to [[expectations]] (which scores rules independently;
    * the funnel composes them in pipeline order). ALL stages count in
    * ONE scan via cumulative conjunctions in a single 1-row aggregate,
    * then unfold to a row per stage; a null predicate fails its stage.
    * `pass_pct` uses integer-scaled rounding. */
  /** Merge per-batch [[filterFunnel]] reports into one corpus-level
    * funnel: entry and survivor counts are additive across disjoint
    * batches (each row passes stage i in the whole corpus iff it
    * passes in its own batch), so incremental curation reporting
    * composes exactly — the same many-small-scans property as
    * [[mergeExpectationReports]] (spec-pinned). */
  def mergeFunnelReports(reports: Seq[DataFrame]): DataFrame = {
    require(reports.nonEmpty, "need at least one report")
    reports.reduce(_.unionByName(_))
      .groupBy("stage_idx", "stage")
      .agg(sum("n_in").as("n_in"), sum("n_pass").as("n_pass"))
      .withColumn("n_dropped", col("n_in") - col("n_pass"))
      .withColumn("pass_pct",
        when(col("n_in") > 0,
          round(col("n_pass") * lit(10000.0) / col("n_in")) / 1e4))
  }

  def filterFunnel(df: DataFrame, stages: Seq[(String, Column)]): DataFrame = {
    require(stages.nonEmpty, "need at least one stage")
    val cum = stages.scanLeft(lit(true)) { case (acc, (_, pred)) =>
      acc && coalesce(pred, lit(false))
    }.tail
    val sums = cum.zipWithIndex.map { case (c, i) =>
      sum(when(c, 1L).otherwise(0L)).as(s"__p$i")
    }
    val agged = df.agg(count(lit(1)).as("__n0"), sums: _*)
    val entries = stages.zipWithIndex.map { case ((name, _), i) =>
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        (if (i == 0) col("__n0") else col(s"__p${i - 1}")).as("n_in"),
        col(s"__p$i").as("n_pass"))
    }
    agged
      .select(explode(array(entries: _*)).as("x"))
      .select(col("x.stage_idx").as("stage_idx"), col("x.stage").as("stage"),
        col("x.n_in").as("n_in"), col("x.n_pass").as("n_pass"),
        (col("x.n_in") - col("x.n_pass")).as("n_dropped"),
        when(col("x.n_in") > 0,
          round(col("x.n_pass") * lit(10000.0) / col("x.n_in")) / 1e4)
          .as("pass_pct"))
  }

  /** Per-source corpus datacard — the one-page report a mixture
    * designer reads BEFORE weighting sources (the "data card" of
    * Gebru et al.'s datasheets, reduced to the measurable): doc and
    * token volume, language spread, exact-duplicate mass, and the
    * Gopher keep rate, one row per source. Token counts and the
    * quality gate come from the SAME single-pass
    * [[TextOps.gopherSignals]] battery the curation funnel applies —
    * the card and the funnel can't disagree. Ratios are 4 dp
    * integer-scaled (see [[TextOps.qualitySignals]]).
    *
    * Scale shape: ONE corpus scan (source/lang/fingerprint ride the
    * gopher pass packed in the id struct), then three map-side-
    * combined aggregates — doc-level sums, a (source, fingerprint)
    * distinct-reduction for dup mass, a (source, lang) distinct-
    * reduction for language spread (pre-agg to distinct pairs, so no
    * countDistinct Expand anywhere) — joined on the |sources|-row key.
    * Output is ≤ |sources| rows however big the corpus. */
  /** The datacard's per-doc battery — (source, lang, fp, n_words,
    * keep) in one scan: the Gopher gate + canonical fingerprint keyed
    * through the packed id struct (gopherSignals is a one-pass
    * per-row battery keyed by an opaque id column). Shared by
    * [[corpusReport]] and the incremental
    * [[graft.ext.CorpusReports.updateSavedCorpusReport]] fold, so the
    * two forms cannot drift. */
  private[ext] def corpusDocSignals(df: DataFrame, idCol: String,
      textCol: String, srcCol: String, langCol: String): DataFrame = {
    val packed = df.select(
      struct(col(idCol), col(srcCol).as("src"), col(langCol).as("lng"),
        TextOps.fingerprint(col(textCol)).as("fp")).as("__k"),
      col(textCol))
    TextOps.gopherSignals(packed, "__k", textCol)
      .select(col("__k.src").as("source"), col("__k.lng").as("lang"),
        col("__k.fp").as("fp"), col("n_words"), col("keep"))
  }

  def corpusReport(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", srcCol: String = "source",
      langCol: String = "lang"): DataFrame = {
    val perDoc = corpusDocSignals(df, idCol, textCol, srcCol, langCol)
      .localCheckpoint() // three aggregate consumers of one scan
    val base = perDoc.groupBy("source").agg(
      count(lit(1)).as("n_docs"),
      sum("n_words").as("n_tokens"),
      sum(when(col("keep"), 1L).otherwise(0L)).as("n_keep"))
    val uniq = perDoc.groupBy("source", "fp").agg(count(lit(1)).as("__c"))
      .groupBy("source").agg(count(lit(1)).as("__n_uniq"))
    val langs = perDoc.select("source", "lang").distinct()
      .groupBy("source").agg(count(lit(1)).as("n_langs"))
    finalizeCorpusReport(base.join(uniq, "source").join(langs, "source"))
  }

  /** The datacard's final projection over (source, n_docs, n_tokens,
    * n_keep, __n_uniq, n_langs) — shared by [[corpusReport]] and
    * [[graft.ext.CorpusReports.reportCorpusFromState]] so the ratio
    * arithmetic cannot drift between the full-scan and incremental
    * forms. */
  private[ext] def finalizeCorpusReport(joined: DataFrame): DataFrame =
    joined
      .select(col("source"), col("n_docs"), col("n_tokens"),
        // integer-scaled rounding — see TextOps.qualitySignals
        (round(col("n_tokens") * lit(10000.0) / col("n_docs")) / 1e4)
          .as("mean_doc_tokens"),
        col("n_langs"),
        (col("n_docs") - col("__n_uniq")).as("n_exact_dup"),
        (round((col("n_docs") - col("__n_uniq")) * lit(10000.0)
          / col("n_docs")) / 1e4).as("dup_ratio"),
        col("n_keep"),
        (round(col("n_keep") * lit(10000.0) / col("n_docs")) / 1e4)
          .as("keep_ratio"))
}
