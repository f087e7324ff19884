package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** Profiling, drift, expectations, sampling and mixture selection. */
trait ProfileQueries extends QueriesBase {

  // ============================================ [EXT] profile / sample

  /** Cross-source n-gram overlap matrix: pairwise shared distinct
    * 5-grams and Jaccard between every source pair — the inter-source
    * duplication report a mixture designer reads before setting
    * source quotas (see [[TextOps.sourceOverlap]]; per-gram candidate
    * work bounded by sources², output ≤ C(S,2) rows). */
  val profileSourceOverlap: Q = (s, dir) =>
    TextOps.sourceOverlap(Tables.documents(s, dir))

  /** Fixed-width value histogram per event type: 50 buckets of width
    * 10 over [0, 500) plus under/overflow — the profiling pass run
    * before picking quality thresholds. One map-side-combined shuffle
    * of ≤ |groups|·52 rows regardless of input size. */
  val aggHistogram: Q = (s, dir) =>
    Profile.histogram(Tables.events(s, dir), Seq("event_type"), col("value"),
      lo = 0.0, hi = 500.0, nBuckets = 50)

  /** Exact second moments per event type: mean / sample variance /
    * sample stddev from cents-scaled DECIMAL power sums — order-
    * independent, hence hash-identical in the oracle (naive stddev
    * is summation-order noise). */
  val aggStatsMoments: Q = (s, dir) =>
    Profile.moments(Tables.events(s, dir), Seq("event_type"), col("value"))

  /** Exact Pearson correlation of value vs day-of-month per event
    * type — the drift probe ("does this metric trend through the
    * month?"), closed-form over five integer partials. */
  val aggCorr: Q = (s, dir) =>
    Profile.pearsonCorr(
      Tables.events(s, dir)
        .select(col("event_type"), col("value"),
          dayofmonth(col("ts")).cast("double").as("d")),
      Seq("event_type"), col("value"), col("d"))

  /** Data-quality expectations: four declared rules validated in one
    * scan, one row per rule with violation counts — the pre-ingest
    * gate every pipeline runs. */
  val qualityExpectations: Q = (s, dir) =>
    Profile.expectations(Tables.events(s, dir), Seq(
      "value_non_negative" -> (col("value") >= 0),
      "value_below_1000" -> (col("value") < 1000),
      "user_id_present" -> col("user_id").isNotNull,
      "known_event_type" -> col("event_type").isin(
        "click", "error", "purchase", "signup", "view")))

  /** Per-column null/distinct profile of the events table in one
    * pass — the schema-health summary (ts profiled at its microsecond
    * grain, mirroring the engine's timestamp resolution). */
  val profileColumns: Q = (s, dir) =>
    Profile.columnProfile(
      Tables.events(s, dir)
        .withColumn("ts_us", unix_micros(col("ts"))).drop("ts"),
      Seq("event_id", "ts_us", "user_id", "event_type", "value"))

  /** The sketch form of profile_columns (HLL distincts, no Expand),
    * CHECKED against the exact profile in the same run: `approx_ok` =
    * |est − exact| ≤ 4·rsd·exact per column (the agg_approx_distinct
    * bound), oracle asserts TRUE. The exact twin rides along only for
    * the check — production use is [[Profile.columnProfileApprox]]
    * alone, which is the stated 100 TB path. */
  val profileColumnsApprox: Q = (s, dir) => {
    val df = Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
    val cols = Seq("event_id", "ts_us", "user_id", "event_type", "value")
    val approx = Profile.columnProfileApprox(df, cols)
      .select(col("column"), col("n_distinct_approx"))
    Profile.columnProfile(df, cols)
      .join(approx, "column")
      .select(col("column"), col("n_nulls"), col("n_distinct"), col("n_rows"),
        (abs(col("n_distinct_approx") - col("n_distinct")) * 5
          <= col("n_distinct")).as("approx_ok"))
  }

  /** [[profileColumnsApprox]] stripped of its gate twin — the HLL
    * profiler alone (no Expand; the stated 100 TB path). Benched via
    * [[SparkEntry.benchForm]]. */
  val profileColumnsApproxBenchForm: Q = (s, dir) => {
    val df = Tables.events(s, dir)
      .withColumn("ts_us", unix_micros(col("ts"))).drop("ts")
    Profile.columnProfileApprox(df,
      Seq("event_id", "ts_us", "user_id", "event_type", "value"))
  }

  /** Equi-depth (quantile-bucket) histogram: ntile(10) buckets per
    * event type with exact counts and value ranges — the companion of
    * the fixed-width agg_histogram for skewed columns (every bucket
    * holds ~n/10 rows; boundaries adapt to the data). Deterministic
    * via the (value, event_id) total order; one window + one
    * map-side-combined shuffle. */
  val aggEquidepth: Q = (s, dir) => {
    val w = Window.partitionBy("event_type")
      .orderBy(round(col("value") * 1e6).cast("long").asc, col("event_id").asc)
    Tables.events(s, dir)
      .withColumn("bucket", ntile(10).over(w))
      .groupBy("event_type", "bucket")
      .agg(count(lit(1)).as("n"), min("value").as("lo"), max("value").as("hi"))
  }

  /** Packing QA: per-source pack counts and fill efficiency against
    * the 512-token budget — the "how much padding am I paying for"
    * check run after pack_budget. */
  val packStats: Q = (s, dir) => {
    val packed = Packing.packByBudget(
      Tables.documents(s, dir).select("doc_id", "source", "text"),
      groupCols = Seq("source"), orderCols = Seq("doc_id"),
      tokens = TextOps.tokenCount(col("text")), budget = 512)
    packed
      .groupBy("source", "pack_id")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_packs"),
        sum("pack_tokens").as("total_tokens"),
        // integer-scaled mean fill vs budget — see qualitySignals
        (round(sum("pack_tokens") * lit(10000.0) / (count(lit(1)) * 512)) / 1e4)
          .as("mean_fill"),
        max("pack_tokens").as("max_pack_tokens"))
  }

  /** MAD-based robust outlier flags per series — the data-quality
    * screen a mean/σ z-score cannot be (one fat-finger spike inflates
    * σ enough to hide itself; the median/MAD pair has a 50% breakdown
    * point — Hampel's rule). Everything stays EXACT: values micro-
    * scale to BIGINT, both medians are exact interpolated percentiles
    * whose interpolation fractions are dyadic (.0/.5 → binary-exact
    * doubles), deviations are carried DOUBLED so the half-grain stays
    * integral, and the 3·MAD comparison happens on those exact
    * dyadics — bit-identical in the oracle. MAD = 0 (a constant-
    * majority series) flags every nonzero deviation, the standard
    * degenerate-MAD posture. Two exact-percentile aggs + two
    * broadcast-sized joins back; at 100 TB swap `percentile` for
    * `approx_percentile` per the [[aggQuantilesApprox]] trade. */
  val scalarRobustZ: Q = (s, dir) => {
    val df = Tables.events(s, dir).select("event_id", "event_type", "value")
      .withColumn("__micro", round(col("value") * 1e6).cast("long"))
    val med = df.groupBy("event_type")
      .agg(percentile(col("__micro"), lit(0.5)).as("__med"))
    val dev = df.join(broadcast(med), "event_type")
      .withColumn("__dev2", abs(lit(2) * col("__micro") - lit(2) * col("__med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("__dev2"), lit(0.5)).as("__mad2"))
    dev.join(broadcast(mad), "event_type")
      .select(col("event_id"), col("event_type"), col("value"),
        (col("__dev2") / 2 / 1e6).as("deviation"),
        (col("__mad2") / 2 / 1e6).as("mad"),
        (col("__dev2") > lit(3) * col("__mad2")).as("is_outlier"))
  }

  /** Per-group z-score standardization over the exact power sums —
    * the feature-normalization per-row companion of agg_stats_moments. */
  val scalarZscore: Q = (s, dir) =>
    Profile.zscore(
      Tables.events(s, dir).select("event_id", "event_type", "value"),
      Seq("event_type"), "value")

  /** Mean imputation on the JSON-extracted `k` column (the same
    * sentinel→try_cast chain as fred_clean_cast, but rows with missing
    * k survive and take their event type's exact mean). */
  val scalarImpute: Q = (s, dir) => {
    val withVal = Tables.events(s, dir)
      .select(col("event_id"), col("event_type"),
        get_json_object(col("props"), "$.k").as("raw_k"))
      .withColumn("k",
        Clean.lenientDouble(
          when(col("raw_k") === Clean.MissingSentinel, lit(null))
            .otherwise(col("raw_k"))))
    Clean.imputeGroupMean(withVal, Seq("event_type"), "k")
      .select("event_id", "event_type", "k", "k_filled", "was_imputed")
  }

  /** IQR winsorization: clamp each value to its event type's exact
    * [p25, p75]. Quartile fractions are binary-exact, so the
    * interpolation — hence the clamp — is bit-identical in the oracle
    * (any other p needs approx_percentile + rows-only at scale). */
  val scalarWinsorize: Q = (s, dir) =>
    Profile.winsorize(
      Tables.events(s, dir).select("event_id", "event_type", "value"),
      Seq("event_type"), "value", pLo = 0.25, pHi = 0.75)

  /** OLS trend per event type: value regressed on day-of-month from
    * the same exact power sums as agg_corr — drift detection. */
  val aggLinfit: Q = (s, dir) =>
    Profile.linearFit(
      Tables.events(s, dir)
        .select(col("event_type"), col("value"),
          dayofmonth(col("ts")).cast("double").as("d")),
      Seq("event_type"), col("d"), col("value"))

  /** Robust scale profile: exact median + MAD per event type (the
    * outlier-immune stddev — see Profile.mad's HALF-micro exactness
    * argument). */
  val aggMad: Q = (s, dir) =>
    Profile.mad(Tables.events(s, dir), Seq("event_type"), "value")

  /** Corpus re-balancing: keep 10% of dominant 'en', half of 'es',
    * everything else — deterministic per-row hash membership, zero
    * shuffle, and the DuckDB oracle replays the exact sample. */
  val sampleStratified: Q = (s, dir) =>
    Sampling.stratified(Tables.documents(s, dir), "doc_id", "lang",
        rates = Seq("en" -> 10, "es" -> 50), defaultPct = 100, salt = "graft")
      .select("doc_id", "lang", "source")

  /** Uniform 25% sample by stable hash membership — the simplest
    * sampling primitive ([[Sampling.hashSample]]): same md5 bucket as
    * the stratified/split family, zero shuffle, re-read/append stable,
    * and the oracle replays the exact membership. */
  val sampleHash: Q = (s, dir) =>
    Sampling.hashSample(Tables.documents(s, dir), "doc_id", pct = 25,
        salt = "graft")
      .select("doc_id", "lang", "source")

  /** Per-source cap: at most 10 docs per source by consistent hash
    * order — the over-represented-domain cap. */
  val sampleCapPerGroup: Q = (s, dir) =>
    Sampling.capPerGroup(Tables.documents(s, dir), Seq("source"), "doc_id",
        k = 10, salt = "graft")
      .select("doc_id", "source", "sample_rank")

  /** Per-vector QA scalars (dim, L2 norm, max|c|, exact mean) — the
    * embedding-batch health check; per-row, no shuffle. */
  val embeddingStats: Q = (s, dir) =>
    VectorStats.vectorStats(Tables.embeddings(s, dir), "vec_id", "embedding")

  /** Exact per-label component centroids as (label, pos, centroid)
    * scalar rows — label-drift monitoring / IVF seeding input. */
  val embeddingCentroids: Q = (s, dir) =>
    VectorStats.componentCentroids(Tables.embeddings(s, dir), "label", "embedding")


  /** Per-source corpus datacard: volume, language spread, exact-dup
    * mass, Gopher keep rate — one row per source, one corpus scan
    * (see [[Profile.corpusReport]]). */
  val reportCorpus: Q = (s, dir) =>
    Profile.corpusReport(Tables.documents(s, dir))

  /** [[reportCorpus]] from SAVED counted state (r17 VERDICT "What's
    * missing" #5 — the last rescan-per-run report): two batch folds
    * into a fresh root (per-source scalars + per-(source, lang)
    * counts as kilobyte partials, per-(source, fingerprint) counts as
    * the one bucketed corpus-sized state), then the datacard answers
    * from state alone — never a corpus rescan. Hash-matches the SAME
    * SQL as the full-scan form (shared oracle val): fold(A) + fold(B)
    * must equal scan(A ∪ B) exactly, distinct reductions included. */
  val reportCorpusIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_corpus_state").toString + "/card"
    graft.ext.CorpusReports.updateSavedCorpusReport(root,
      docs.filter(col("doc_id") % 10 =!= 7), batchId = 0L)
    graft.ext.CorpusReports.updateSavedCorpusReport(root,
      docs.filter(col("doc_id") % 10 === 7), batchId = 1L)
    graft.ext.CorpusReports.reportCorpusFromState(s, root)
  }

  /** This family's slice of [[Queries.all]]. */
  protected def profileRegistry: Map[String, Q] = Map(
    "report_corpus" -> reportCorpus,
    "report_corpus_incremental" -> reportCorpusIncremental,
    "profile_source_overlap" -> profileSourceOverlap,
    "agg_histogram" -> aggHistogram,
    "agg_equidepth" -> aggEquidepth,
    "quality_expectations" -> qualityExpectations,
    "profile_columns" -> profileColumns,
    "profile_columns_approx" -> profileColumnsApprox,
    "agg_stats_moments" -> aggStatsMoments,
    "agg_corr" -> aggCorr,
    "agg_mad" -> aggMad,
    "agg_linfit" -> aggLinfit,
    "scalar_winsorize" -> scalarWinsorize,
    "scalar_zscore" -> scalarZscore,
    "scalar_robust_z" -> scalarRobustZ,
    "scalar_impute" -> scalarImpute,
    "sample_stratified" -> sampleStratified,
    "sample_hash" -> sampleHash,
    "sample_cap_per_group" -> sampleCapPerGroup,
    "embedding_stats" -> embeddingStats,
    "embedding_centroids" -> embeddingCentroids,
    "pack_stats" -> packStats)
}
