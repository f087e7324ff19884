package graft

import graft.OracleCtes._

/** DuckDB twins for the [[WindowQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object WindowOracles {
  val map: Map[String, String] = Map(
    // Mirrors SeriesOps.seasonalAnomaly over monthly order revenue:
    // micro-integer monthly sums, climatology = Σmicro/(n·10⁶) — exact
    // numerator, ONE IEEE division — and value/anomaly derived from
    // the same two deterministic doubles in the same order.
    "window_seasonal" ->
      """WITH mi AS (
        |  SELECT o_orderstatus AS status,
        |         CAST(year(o_orderdate) AS INTEGER) AS y,
        |         CAST(month(o_orderdate) AS INTEGER) AS m,
        |         sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS micro
        |  FROM orders GROUP BY 1, 2, 3),
        |c AS (SELECT status, m, CAST(count(*) AS BIGINT) AS n_years,
        |        CAST(sum(micro) AS DOUBLE) / (count(*) * 1000000.0) AS climatology
        |      FROM mi GROUP BY 1, 2)
        |SELECT status, y, m, n_years, climatology,
        |       CAST(micro AS DOUBLE) / 1000000 AS value,
        |       CAST(micro AS DOUBLE) / 1000000 - climatology AS anomaly
        |FROM mi JOIN c USING (status, m)""".stripMargin,

    "window_mom" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       value - lag(value) OVER (
         |         PARTITION BY indicator ORDER BY observation_day) AS change
         |FROM d""".stripMargin,

    // Mirrors SeriesOps.theilSen: pairwise slopes as two mirrored
    // IEEE divisions of micro-scaled BIGINTs; lower median at row
    // (n+1)//2 under the deterministic (slope, oa, ob) order.
    "series_theilsen" ->
      s"""WITH d AS ($dailySeriesCte),
         |b AS (SELECT indicator AS k, observation_day AS o,
         |        CAST(round(value * 1000000) AS BIGINT) AS v FROM d),
         |p AS (SELECT x.k, x.o AS oa, y.o AS ob,
         |        (CAST(y.v - x.v AS DOUBLE) / CAST(y.o - x.o AS DOUBLE))
         |          / 1000000 AS slope
         |      FROM b x JOIN b y ON x.k = y.k AND x.o < y.o),
         |r AS (SELECT k, slope, row_number() OVER (
         |        PARTITION BY k ORDER BY slope ASC, oa ASC, ob ASC) AS rn,
         |        CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
         |      FROM p)
         |SELECT k AS indicator, n AS n_pairs, slope AS slope_median
         |FROM r WHERE rn = (n + 1) // 2""".stripMargin,

    // Mirrors SeriesOps.changePoint: micro-scaled BIGINT prefix sums,
    // exact numerator root d = n·S1 − n1·S, score = d·d / (n1·n2·n)
    // / 1e12 as the same two-IEEE-step chain — the argmax
    // (score DESC, day ASC) is engine-independent with no rounding.
    "series_changepoint" ->
      s"""WITH ds AS ($dailySeriesCte),
         |b AS (SELECT indicator AS k, observation_day AS o,
         |        CAST(round(value * 1000000) AS BIGINT) AS v FROM ds),
         |sc AS (SELECT k, o,
         |         CAST(sum(v) OVER (PARTITION BY k ORDER BY o
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
         |         CAST(count(*) OVER (PARTITION BY k ORDER BY o
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS n1,
         |         CAST(sum(v) OVER (PARTITION BY k) AS BIGINT) AS s,
         |         CAST(count(*) OVER (PARTITION BY k) AS BIGINT) AS n
         |       FROM b),
         |g AS (SELECT k, o, s1, n1, s, n,
         |        CAST(n * s1 - n1 * s AS DOUBLE) AS d
         |      FROM sc WHERE n1 < n),
         |r AS (SELECT k, o, s1, n1, s, n,
         |        d * d / CAST(n1 * (n - n1) * n AS DOUBLE) / 1000000000000 AS score,
         |        row_number() OVER (PARTITION BY k ORDER BY
         |          d * d / CAST(n1 * (n - n1) * n AS DOUBLE) / 1000000000000 DESC,
         |          o ASC) AS rk
         |      FROM g)
         |SELECT k AS indicator, o AS split_observation_day,
         |       n1 AS n_before, (n - n1) AS n_after,
         |       CAST(s1 AS DOUBLE) / n1 / 1000000 AS mean_before,
         |       CAST(s - s1 AS DOUBLE) / (n - n1) / 1000000 AS mean_after,
         |       score
         |FROM r WHERE rk = 1""".stripMargin,

    // Mirrors windowYoy: lag-12 observations within each status series.
    "window_yoy" ->
      """WITH m AS (
        |  SELECT o_orderstatus AS status,
        |         CAST(year(o_orderdate) AS INTEGER) AS y,
        |         CAST(month(o_orderdate) AS INTEGER) AS m,
        |         CAST(sum(CAST(round(o_totalprice * 1000000) AS BIGINT)) AS DOUBLE)
        |           / 1000000 AS value
        |  FROM orders GROUP BY 1, 2, 3)
        |SELECT status, y, m, value,
        |       value - lag(value, 12) OVER (
        |         PARTITION BY status ORDER BY y, m) AS yoy_change
        |FROM m""".stripMargin,

    "window_moving_avg" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       round(avg(value) OVER (
         |         PARTITION BY indicator ORDER BY observation_day
         |         ROWS BETWEEN 6 PRECEDING AND CURRENT ROW) * 10000) / 10000 AS moving_avg
         |FROM d""".stripMargin,

    // Mirrors SeriesOps.ewma (α=½, depth 16): dyadic weights 2^(16−k)
    // over micro-integer values, present-weight denominator
    // 2^17 − 2^(16−m), one mirrored IEEE division.
    "window_ewma" -> {
      val num = (0 to 16).map(k =>
        s"coalesce(lag(CAST(round(value * 1000000) AS BIGINT), $k) OVER win" +
        s" * ${1L << (16 - k)}, 0)").mkString("\n         + ")
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       round(($num)
         |         / ((131072 - (1 << CAST(16 - least(
         |              CAST(row_number() OVER win AS BIGINT) - 1, 16) AS INTEGER)))
         |            * 100.0)) / 10000 AS ewma
         |FROM d
         |WINDOW win AS (PARTITION BY indicator ORDER BY observation_day)""".stripMargin
    },

    "window_rank_share" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       CAST(rank() OVER (
         |         PARTITION BY indicator
         |         ORDER BY value DESC, observation_day) AS INTEGER) AS day_rank,
         |       round(value * 10000 / sum(value) OVER (PARTITION BY indicator)) / 10000
         |         + 0.0 AS share
         |FROM d""".stripMargin,

    // Mirrors windowLocf: sparse series densified with
    // last_value IGNORE NULLS over the same frame.
    "window_locf" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, v_sparse,
         |       last_value(v_sparse IGNORE NULLS) OVER (
         |         PARTITION BY indicator ORDER BY observation_day
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
         |FROM (SELECT indicator, observation_day,
         |             CASE WHEN observation_day % 3 = 0 THEN value END AS v_sparse
         |      FROM d)""".stripMargin,

    // Mirrors SeriesOps.interpolateFill over the window_locf sparse
    // series: prev/next non-null anchors from mirrored frames, the
    // identical straight-line expression tree, shared 4-dp round;
    // edge gaps (one anchor) stay NULL.
    "window_interpolate" ->
      s"""WITH d AS ($dailySeriesCte),
         |s AS (SELECT indicator, observation_day,
         |             CASE WHEN observation_day % 3 = 0 THEN value END AS v_sparse
         |      FROM d),
         |x AS (SELECT indicator, observation_day, v_sparse,
         |        last_value(v_sparse IGNORE NULLS) OVER wp AS v0,
         |        last_value(CASE WHEN v_sparse IS NOT NULL
         |          THEN observation_day END IGNORE NULLS) OVER wp AS t0,
         |        first_value(v_sparse IGNORE NULLS) OVER wn AS v1,
         |        first_value(CASE WHEN v_sparse IS NOT NULL
         |          THEN observation_day END IGNORE NULLS) OVER wn AS t1
         |      FROM s
         |      WINDOW wp AS (PARTITION BY indicator ORDER BY observation_day
         |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
         |             wn AS (PARTITION BY indicator ORDER BY observation_day
         |               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING))
         |SELECT indicator, observation_day, v_sparse,
         |       CASE WHEN v_sparse IS NOT NULL THEN v_sparse
         |            WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN
         |              round((v0 + (v1 - v0) * (observation_day - t0)
         |                     / (t1 - t0)) * 10000) / 10000
         |       END AS filled
         |FROM x""".stripMargin,

    // Mirrors SeriesOps.sessionize: lag-gap break flags, running sum
    // (epoch_us ordering matches Spark's µs truncation).
    "window_sessionize" ->
      """SELECT user_id, event_id, ts_us,
        |       CAST(sum(brk) OVER (PARTITION BY user_id
        |         ORDER BY ts_us, event_id
        |         ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
        |FROM (
        |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
        |         CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |                PARTITION BY user_id ORDER BY epoch_us(ts), event_id)
        |              >= 1800000000 THEN 1 ELSE 0 END AS brk
        |  FROM events)""".stripMargin,

    // Mirrors windowCume: distinct ORDER BY keys make percent_rank and
    // cume_dist exact rationals — no rounding needed.
    "window_cume" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       percent_rank() OVER (PARTITION BY indicator
         |         ORDER BY value, observation_day) AS pct_rank,
         |       cume_dist() OVER (PARTITION BY indicator
         |         ORDER BY value, observation_day) AS cume
         |FROM d""".stripMargin,

    "window_tumbling" ->
      """SELECT epoch_us(date_trunc('hour', ts)) AS window_start_us,
        |       event_type, count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events GROUP BY 1, 2""".stripMargin,

    "window_session" ->
      """WITH o AS (
        |  SELECT user_id, ts, value,
        |         CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |                   >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS brk
        |  FROM events),
        |g AS (
        |  SELECT *, sum(brk) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    ROWS UNBOUNDED PRECEDING) AS grp
        |  FROM o)
        |SELECT epoch_us(min(ts)) AS session_start_us, user_id,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM g GROUP BY user_id, grp""".stripMargin,

    // Mirrors the bucketed interval join (plain BETWEEN in SQL —
    // bucketing is a physical strategy, not a semantic one).
    "join_range" ->
      """WITH windows AS (
        |  SELECT event_type, d_lo, d_hi
        |  FROM (SELECT DISTINCT event_type FROM events)
        |  CROSS JOIN (VALUES (2, 9), (12, 19), (22, 29)) w(d_lo, d_hi)),
        |p AS (SELECT event_type, CAST(day(ts) AS BIGINT) AS d, value FROM events)
        |SELECT p.event_type, CAST(d_lo AS BIGINT) AS d_lo, CAST(d_hi AS BIGINT) AS d_hi,
        |       count(*) AS n_events,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM p JOIN windows
        |  ON p.event_type = windows.event_type AND p.d BETWEEN d_lo AND d_hi
        |GROUP BY 1, 2, 3""".stripMargin,

    // Mirrors RangeJoin.intervalOverlap's OUTPUT with the direct
    // overlap predicate (the bucketing is a physical strategy, not a
    // semantic): per-(event_type,user) activity span vs the per-type
    // promo windows, closed-interval overlap.
    "join_interval_overlap" ->
      """WITH sp AS (
        |  SELECT event_type, user_id,
        |         min(day(ts)) AS u_lo, max(day(ts)) AS u_hi
        |  FROM events GROUP BY 1, 2),
        |windows AS (
        |  SELECT DISTINCT event_type, d_lo, d_hi FROM events
        |  CROSS JOIN (VALUES (2, 9), (12, 19), (22, 29)) w(d_lo, d_hi))
        |SELECT sp.event_type, CAST(d_lo AS BIGINT) AS d_lo,
        |       CAST(d_hi AS BIGINT) AS d_hi,
        |       count(*) AS n_users,
        |       CAST(sum(u_hi - u_lo) AS BIGINT) AS span_days_sum
        |FROM sp JOIN windows
        |  ON sp.event_type = windows.event_type
        | AND u_lo <= d_hi AND d_lo <= u_hi
        |GROUP BY 1, 2, 3""".stripMargin,

    "series_asof" ->
      s"""WITH d AS ($dailySeriesCte),
         |sparse AS (SELECT * FROM d WHERE observation_day % 3 = 0),
         |u AS (
         |  SELECT indicator, observation_day, value, 1 AS side, CAST(NULL AS DOUBLE) AS rv FROM d
         |  UNION ALL
         |  SELECT indicator, observation_day, NULL, 0, value FROM sparse)
         |SELECT indicator, observation_day, value, asof_value FROM (
         |  SELECT indicator, observation_day, value, side,
         |         last_value(rv IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS asof_value
         |  FROM u)
         |WHERE side = 1""".stripMargin,

    // Mirrors SeriesOps.asofJoinTolerance: same union-window carry as
    // series_asof plus the right time, staleness > 1 day → null. rv/rt
    // are null together, so separate IGNORE NULLS carries stay paired.
    "series_asof_tolerance" ->
      s"""WITH d AS ($dailySeriesCte),
         |sparse AS (SELECT * FROM d WHERE observation_day % 3 = 0),
         |u AS (
         |  SELECT indicator, observation_day, value, 1 AS side,
         |         CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS BIGINT) AS rt FROM d
         |  UNION ALL
         |  SELECT indicator, observation_day, NULL, 0, value,
         |         CAST(observation_day AS BIGINT) FROM sparse)
         |SELECT indicator, observation_day, value,
         |       CASE WHEN observation_day - crt <= 1 THEN crv END AS asof_value
         |FROM (
         |  SELECT indicator, observation_day, value, side,
         |         last_value(rv IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crv,
         |         last_value(rt IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS crt
         |  FROM u)
         |WHERE side = 1""".stripMargin,

    // Mirrors SeriesOps.asofJoinForward: union-window carry with left
    // rows FIRST at equal times and a first_value IGNORE NULLS over a
    // current-to-unbounded-FOLLOWING frame.
    "series_asof_forward" ->
      s"""WITH d AS ($dailySeriesCte),
         |sparse AS (SELECT * FROM d WHERE observation_day % 3 = 0),
         |u AS (
         |  SELECT indicator, observation_day, value, 0 AS side, CAST(NULL AS DOUBLE) AS rv FROM d
         |  UNION ALL
         |  SELECT indicator, observation_day, NULL, 1, value FROM sparse)
         |SELECT indicator, observation_day, value, asof_value FROM (
         |  SELECT indicator, observation_day, value, side,
         |         first_value(rv IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS asof_value
         |  FROM u)
         |WHERE side = 0""".stripMargin,

    // Mirrors SeriesOps.asofJoinForwardTolerance: forward carry of
    // (rv, rt) pairs, next-match further than 1 day ahead → null.
    "series_asof_forward_tolerance" ->
      s"""WITH d AS ($dailySeriesCte),
         |sparse AS (SELECT * FROM d WHERE observation_day % 3 = 0),
         |u AS (
         |  SELECT indicator, observation_day, value, 0 AS side,
         |         CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS BIGINT) AS rt FROM d
         |  UNION ALL
         |  SELECT indicator, observation_day, NULL, 1, value,
         |         CAST(observation_day AS BIGINT) FROM sparse)
         |SELECT indicator, observation_day, value,
         |       CASE WHEN crt - observation_day <= 1 THEN crv END AS asof_value
         |FROM (
         |  SELECT indicator, observation_day, value, side,
         |         first_value(rv IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS crv,
         |         first_value(rt IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS crt
         |  FROM u)
         |WHERE side = 0""".stripMargin,

    // Mirrors SeriesOps.asofJoinNearest: backward + forward carries of
    // (rv, rt) pairs over ONE ordering (right rows first at equal
    // times), then per-row distance compare with ties to the earlier
    // observation. rv/rt are null together, so the paired IGNORE NULLS
    // carries stay consistent.
    "series_asof_nearest" ->
      s"""WITH d AS ($dailySeriesCte),
         |sparse AS (SELECT * FROM d WHERE observation_day % 3 = 0),
         |u AS (
         |  SELECT indicator, observation_day, value, 1 AS side,
         |         CAST(NULL AS DOUBLE) AS rv, CAST(NULL AS BIGINT) AS rt FROM d
         |  UNION ALL
         |  SELECT indicator, observation_day, NULL, 0, value,
         |         CAST(observation_day AS BIGINT) FROM sparse)
         |SELECT indicator, observation_day, value,
         |       CASE WHEN bt IS NULL THEN fv
         |            WHEN ft IS NULL THEN bv
         |            WHEN observation_day - bt <= ft - observation_day THEN bv
         |            ELSE fv END AS asof_value
         |FROM (
         |  SELECT indicator, observation_day, value, side,
         |         last_value(rv IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bv,
         |         last_value(rt IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS bt,
         |         first_value(rv IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS fv,
         |         first_value(rt IGNORE NULLS) OVER (
         |           PARTITION BY indicator ORDER BY observation_day, side
         |           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS ft
         |  FROM u)
         |WHERE side = 1""".stripMargin,

    // Mirrors SeriesOps.transitionCounts: lead over (user, time) then
    // count + per-origin share.
    "events_transitions" ->
      """WITH t AS (
        |  SELECT event_type,
        |         lead(event_type) OVER (PARTITION BY user_id
        |           ORDER BY epoch_us(ts), event_id) AS next_state
        |  FROM events),
        |c AS (SELECT event_type, next_state, count(*) AS n
        |      FROM t WHERE next_state IS NOT NULL GROUP BY 1, 2)
        |SELECT event_type, next_state, n,
        |       round(n * 10000.0 / sum(n) OVER (PARTITION BY event_type)) / 10000
        |         AS share
        |FROM c""".stripMargin,

    // Mirrors SeriesOps.topPaths(k = 20): two leads over the shared
    // entity sort, global path counts, the (n DESC, path ASC) total
    // order making the top-20 cut deterministic.
    "events_paths" ->
      """WITH t AS (
        |  SELECT event_type AS s1,
        |         lead(event_type, 1) OVER w AS s2,
        |         lead(event_type, 2) OVER w AS s3
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT s1, s2, s3, CAST(count(*) AS BIGINT) AS n
        |FROM t WHERE s2 IS NOT NULL AND s3 IS NOT NULL
        |GROUP BY 1, 2, 3
        |ORDER BY n DESC, s1 ASC, s2 ASC, s3 ASC
        |LIMIT 20""".stripMargin
  )
}
