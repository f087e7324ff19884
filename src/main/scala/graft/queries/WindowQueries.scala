package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** Window/series analytics: deltas, ranks, sessionization, as-of, range. */
trait WindowQueries extends QueriesBase {

  // ==================================================== [EXT] windows

  /** lag — period-over-period change (FRED MoM analog at day grain).
    * No rounding: both engines subtract bit-identical doubles. */
  val windowMom: Q = (s, dir) =>
    SeriesOps.periodChange(dailySeries(s, dir),
      Seq("indicator"), Seq("observation_day"))

  /** Trailing 7-observation moving average (integer-scaled rounding —
    * mean-of-7 rationals hit .xxxx5 boundaries). */
  val windowMovingAvg: Q = (s, dir) =>
    SeriesOps.movingAvg(dailySeries(s, dir),
        Seq("indicator"), Seq("observation_day"), n = 7)
      .withColumn("moving_avg", round(col("moving_avg") * lit(10000.0)) / 1e4)

  /** Exact dyadic EWMA (α = ½, depth 16) per indicator — the trend
    * smoother in pure integer weight space (see [[SeriesOps.ewma]]). */
  val windowEwma: Q = (s, dir) =>
    SeriesOps.ewma(dailySeries(s, dir),
      Seq("indicator"), Seq("observation_day"))

  /** rank + partition share. */
  val windowRankShare: Q = (s, dir) => {
    val d = dailySeries(s, dir)
    val byInd = Window.partitionBy("indicator")
    d.withColumn("day_rank",
        rank().over(byInd.orderBy(col("value").desc, col("observation_day"))))
      .withColumn("share",
        // + 0.0 drops IEEE negative zero: round(-0.4) is +0 in Spark
        // (BigDecimal) but -0.0 in DuckDB; a tiny negative share would
        // otherwise hash-differ (caught by the differential fuzz)
        round(col("value") * lit(10000.0) / sum("value").over(byInd)) / 1e4 + lit(0.0))
  }

  /** percent_rank + cume_dist per indicator: the full-distribution
    * placement windows (curriculum position, percentile features).
    * The day tiebreak makes every ORDER BY key distinct, so both are
    * exact rationals — (rn−1)/(n−1) and rn/n — bit-identical across
    * engines with no rounding needed. */
  val windowCume: Q = (s, dir) => {
    val w = Window.partitionBy("indicator")
      .orderBy(col("value").asc, col("observation_day").asc)
    dailySeries(s, dir)
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
  }

  /** Year-over-year change: monthly order revenue per status, minus
    * the value 12 observations earlier in the same series (orders span
    * 6+ years; exact integer-cent sums, subtraction of bit-identical
    * doubles needs no rounding — see window_mom). */
  val windowYoy: Q = (s, dir) => {
    val monthly = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg((sumE6(col("o_totalprice")).cast("double") / 1e6).as("value"))
    SeriesOps.yoyChange(monthly, Seq("status"), Seq("y", "m"))
  }

  /** Seasonal climatology + anomaly over monthly order revenue: per
    * (status, month-of-year) the cross-year mean in exact micro-integer
    * space, per (status, y, m) the deviation — the economic-series
    * decomposition the YoY lag only approximates (see
    * [[SeriesOps.seasonalAnomaly]]). Orders spans multiple years, so
    * every climatology cell averages real cross-year mass (events
    * spans one month — the degenerate-fixture trap the r10 advice
    * flagged for retention). */
  val windowSeasonal: Q = (s, dir) => {
    val micro = Tables.orders(s, dir)
      .groupBy(col("o_orderstatus").as("status"),
        year(col("o_orderdate")).as("y"), month(col("o_orderdate")).as("m"))
      .agg(sumE6(col("o_totalprice")).as("__micro"))
    SeriesOps.seasonalAnomaly(micro, Seq("status"), "m", "__micro")
  }

  /** LOCF gap fill: the daily series sparsified to every 3rd day, then
    * densified by carrying the last observation forward (leading gaps
    * stay null). */
  val windowLocf: Q = (s, dir) =>
    SeriesOps.locfFill(
      dailySeries(s, dir)
        .withColumn("v_sparse",
          when(col("observation_day") % 3 === 0, col("value")))
        .drop("value"),
      Seq("indicator"), Seq("observation_day"), "v_sparse")

  /** Linear-interpolation gap fill: the same every-3rd-day sparse
    * series as [[windowLocf]], interior nulls taking the straight
    * line through their neighbors (leading/trailing gaps stay null) —
    * the densification a modeling pipeline wants where LOCF's step
    * function biases. */
  val windowInterpolate: Q = (s, dir) =>
    SeriesOps.interpolateFill(
      dailySeries(s, dir)
        .withColumn("v_sparse",
          when(col("observation_day") % 3 === 0, col("value")))
        .drop("value"),
      Seq("indicator"), "observation_day", "v_sparse")

  /** Row-level sessionization: each event tagged with its 0-based
    * session ordinal (30-minute gap) — the joinable form of
    * window_session. */
  val windowSessionize: Q = (s, dir) =>
    SeriesOps.sessionize(
      Tables.events(s, dir)
        .select(col("user_id"), col("event_id"),
          unix_micros(col("ts")).as("ts_us")),
      "user_id", "ts_us", Seq("ts_us", "event_id"), gapUs = 30L * 60 * 1000000)

  /** Tumbling event-time windows in batch mode — the same groupBy
    * shape [[graft.streaming.EventStreams.tumblingAgg]] runs on a
    * stream (SURVEY §2.J). Window starts emitted as epoch micros so
    * the oracle compare is timestamp-representation-free. */
  val windowTumbling: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        (sumE6(col("value")).cast("double") / 1e6).as("value_sum"))
      .select(unix_micros(col("window.start")).as("window_start_us"),
        col("event_type"), col("n_events"), col("value_sum"))

  /** Sessionization in batch mode: session_window with a 30-minute
    * gap per user — sessions close when the next event is ≥ gap after
    * the previous one, the exact islands semantics the SQL oracle
    * reproduces with lag + cumulative break counts. */
  val windowSession: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        (sumE6(col("value")).cast("double") / 1e6).as("value_sum"))
      .select(unix_micros(col("session_window.start")).as("session_start_us"),
        col("user_id"), col("n_events"), col("value_sum"))

  /** Interval join via bucketing: events (point = day-of-month) matched
    * to per-type promo windows — the scale-safe equi-bucket form of
    * `t BETWEEN lo AND hi`, never a nested loop. */
  val joinRange: Q = (s, dir) => {
    val sess = s
    import sess.implicits._
    val points = Tables.events(s, dir)
      .select(col("event_type"), dayofmonth(col("ts")).cast("long").as("d"),
        col("value"))
    val windows = Tables.events(s, dir).select("event_type").distinct()
      .crossJoin(Seq((2L, 9L), (12L, 19L), (22L, 29L)).toDF("d_lo", "d_hi"))
    graft.operators.RangeJoin
      .pointInInterval(points, windows, "d", "d_lo", "d_hi",
        keys = Seq("event_type"), bucketWidth = 8L)
      .groupBy("event_type", "d_lo", "d_hi")
      .agg(count(lit(1)).as("n_events"),
        (sumE6(col("value")).cast("double") / 1e6).as("value_sum"))
  }

  /** Interval×interval OVERLAP join via double bucketing: each
    * (user, event_type) activity span [first day, last day] matched
    * to the per-type promo windows it overlaps — the
    * sessions×windows audit (`a_lo ≤ b_hi AND b_lo ≤ a_hi`), exact
    * predicate after the bucket equi-join, each pair emitted once
    * from its intersection-low bucket (no distinct over the pair
    * blowup). */
  val joinIntervalOverlap: Q = (s, dir) => {
    val sess = s
    import sess.implicits._
    val spans = Tables.events(s, dir)
      .select(col("event_type"), col("user_id"),
        dayofmonth(col("ts")).cast("long").as("d"))
      .groupBy("event_type", "user_id")
      .agg(min(col("d")).as("u_lo"), max(col("d")).as("u_hi"))
    val windows = Tables.events(s, dir).select("event_type").distinct()
      .crossJoin(Seq((2L, 9L), (12L, 19L), (22L, 29L)).toDF("d_lo", "d_hi"))
    graft.operators.RangeJoin
      .intervalOverlap(spans, windows, "u_lo", "u_hi", "d_lo", "d_hi",
        keys = Seq("event_type"), bucketWidth = 8L)
      .groupBy("event_type", "d_lo", "d_hi")
      .agg(count(lit(1)).as("n_users"),
        sum(col("u_hi") - col("u_lo")).as("span_days_sum"))
  }

  /** Single change-point per indicator series: the split maximizing
    * the between-segment SSE reduction over the daily values —
    * drift LOCALIZATION (where the mean jumped), exact-BIGINT
    * numerator + two mirrored IEEE steps so the argmax is
    * engine-independent ([[SeriesOps.changePoint]]). */
  val seriesChangepoint: Q = (s, dir) =>
    SeriesOps.changePoint(dailySeries(s, dir),
      "indicator", "observation_day", "value")

  /** Theil–Sen robust trend per indicator: the median pairwise slope
    * — one corrupted day drags the OLS `agg_linfit` arbitrarily but
    * moves this ≤ one order statistic ([[SeriesOps.theilSen]]). */
  val seriesTheilsen: Q = (s, dir) =>
    SeriesOps.theilSen(dailySeries(s, dir),
      "indicator", "observation_day", "value")

  /** As-of join: align each daily point with the most recent sparse
    * (every-3rd-day) observation at or before it. */
  val seriesAsof: Q = (s, dir) => {
    val d = dailySeries(s, dir)
    val sparse = d.filter(col("observation_day") % 3 === 0)
    SeriesOps.asofJoin(d, sparse, Seq("indicator"), "observation_day", "value")
  }

  /** As-of with staleness bound: matches older than 1 day are nulled
    * (day ≡ 2 mod 3 sits 2 days past its sparse anchor → null). */
  val seriesAsofTolerance: Q = (s, dir) => {
    val d = dailySeries(s, dir)
    val sparse = d.filter(col("observation_day") % 3 === 0)
    SeriesOps.asofJoinTolerance(d, sparse, Seq("indicator"),
      "observation_day", "value", tolerance = 1L)
  }

  /** Forward as-of join: align each daily point with the EARLIEST
    * sparse (every-3rd-day) observation at or after it — the
    * event-to-outcome alignment mirror of [[seriesAsof]]. */
  val seriesAsofForward: Q = (s, dir) => {
    val d = dailySeries(s, dir)
    val sparse = d.filter(col("observation_day") % 3 === 0)
    SeriesOps.asofJoinForward(d, sparse, Seq("indicator"),
      "observation_day", "value")
  }

  /** Forward as-of with staleness bound: next observations further
    * than 1 day ahead are nulled (day ≡ 1 mod 3 sits 2 days before
    * its next sparse anchor → null; ≡ 2 mod 3 sits 1 day → keep). */
  val seriesAsofForwardTolerance: Q = (s, dir) => {
    val d = dailySeries(s, dir)
    val sparse = d.filter(col("observation_day") % 3 === 0)
    SeriesOps.asofJoinForwardTolerance(d, sparse, Seq("indicator"),
      "observation_day", "value", tolerance = 1L)
  }

  /** Nearest as-of: each daily point takes whichever sparse
    * observation is closer (day ≡ 1 mod 3 → the anchor 1 back; ≡ 2
    * mod 3 → the anchor 1 ahead; ties to the earlier). */
  val seriesAsofNearest: Q = (s, dir) => {
    val d = dailySeries(s, dir)
    val sparse = d.filter(col("observation_day") % 3 === 0)
    SeriesOps.asofJoinNearest(d, sparse, Seq("indicator"),
      "observation_day", "value")
  }

  /** Markov transition matrix over each user's event sequence: step
    * counts + per-origin share — the funnel/drop-off summary. */
  val eventsTransitions: Q = (s, dir) =>
    SeriesOps.transitionCounts(
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
      "user_id", "event_type", Seq("ts", "event_id"))
      .select("event_type", "next_state", "n", "share")

  /** Top-20 3-step event paths over each user's ordered stream — the
    * sequence-mining sibling of [[eventsTransitions]] (which paths,
    * not just which steps, dominate). Deterministic cut: count DESC
    * then path ASC. */
  val eventsPaths: Q = (s, dir) =>
    SeriesOps.topPaths(
      Tables.events(s, dir)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id")),
      "user_id", "event_type", Seq("ts", "event_id"), k = 20)


  /** This family's slice of [[Queries.all]]. */
  protected def windowRegistry: Map[String, Q] = Map(
    "window_mom" -> windowMom,
    "window_yoy" -> windowYoy,
    "window_seasonal" -> windowSeasonal,
    "window_moving_avg" -> windowMovingAvg,
    "window_ewma" -> windowEwma,
    "window_rank_share" -> windowRankShare,
    "window_cume" -> windowCume,
    "window_locf" -> windowLocf,
    "window_interpolate" -> windowInterpolate,
    "window_sessionize" -> windowSessionize,
    "window_tumbling" -> windowTumbling,
    "window_session" -> windowSession,
    "series_asof" -> seriesAsof,
    "series_asof_tolerance" -> seriesAsofTolerance,
    "series_asof_forward" -> seriesAsofForward,
    "series_asof_forward_tolerance" -> seriesAsofForwardTolerance,
    "series_asof_nearest" -> seriesAsofNearest,
    "series_changepoint" -> seriesChangepoint,
    "series_theilsen" -> seriesTheilsen,
    "events_transitions" -> eventsTransitions,
    "events_paths" -> eventsPaths,
    "join_range" -> joinRange,
    "join_interval_overlap" -> joinIntervalOverlap)
}
