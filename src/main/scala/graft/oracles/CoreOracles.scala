package graft

import graft.OracleCtes._

/** DuckDB twins for the [[CoreQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object CoreOracles {
  val map: Map[String, String] = Map(
    "fred_monthly_agg" ->
      s"""SELECT event_type AS indicator,
        |       CAST(year(ts) AS INTEGER) AS observation_year,
        |       CAST(month(ts) AS INTEGER) AS observation_month,
        |       $exactAvgSql AS value,
        |       count(value) AS observation_count
        |FROM events GROUP BY 1, 2, 3""".stripMargin,

    "fred_daily_agg" -> dailySilverCte,

    "fred_clean_cast" ->
      """SELECT event_type,
        |       CAST(sum(CAST(round(v * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS k_sum,
        |       count(v) AS k_count
        |FROM (
        |  SELECT event_type,
        |         TRY_CAST(json_extract_string(props, '$.k') AS DOUBLE) AS v
        |  FROM events
        |  WHERE json_extract_string(props, '$.k') IS NULL
        |     OR json_extract_string(props, '$.k') <> '.'
        |)
        |WHERE v IS NOT NULL
        |GROUP BY 1""".stripMargin,

    // Exact-integer HALF_EVEN of the rational mean (see the
    // fredYearlyGold scaladoc: engine double-rounding resolves printed
    // ties by engine-specific rules, so the gate rounds the exact
    // integers — micro-sum carried straight from the silver agg here).
    "fred_yearly_gold" ->
      """WITH silver AS (
        |  SELECT event_type AS indicator,
        |         CAST(year(ts) AS INTEGER) AS observation_year,
        |         CAST(month(ts) AS INTEGER) AS observation_month,
        |         CAST(day(ts) AS INTEGER) AS observation_day,
        |         sum(CAST(round(value * 1000000) AS BIGINT)) AS ms,
        |         count(value) AS observation_count
        |  FROM events GROUP BY 1, 2, 3, 4),
        |u AS (
        |  SELECT * FROM silver WHERE observation_day <= 15
        |  UNION ALL
        |  SELECT * FROM silver WHERE observation_day > 15),
        |x AS (SELECT *, observation_count * 10000 AS d,
        |        ((ms % (observation_count * 10000)) + observation_count * 10000)
        |          % (observation_count * 10000) AS r
        |      FROM u),
        |y AS (SELECT *, (ms - r) // d AS q FROM x)
        |SELECT indicator, observation_year, observation_month, observation_day,
        |       CAST(q + CASE WHEN r * 2 > d THEN 1
        |                     WHEN r * 2 < d THEN 0
        |                     ELSE ((q % 2) + 2) % 2 END AS DOUBLE) / 100 AS value,
        |       observation_count
        |FROM y""".stripMargin,

    "fred_dedup_sync" ->
      """SELECT user_id, event_type
        |FROM (SELECT DISTINCT user_id, event_type FROM events) i
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM events e
        |  WHERE e.event_id % 7 = 0
        |    AND e.user_id = i.user_id AND e.event_type = i.event_type)""".stripMargin,

    "fred_upsert_merge" ->
      """SELECT user_id, event_type, event_id, value
        |FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         row_number() OVER (
        |           PARTITION BY user_id, event_type
        |           ORDER BY CASE WHEN day(ts) > 20 THEN 1 ELSE 0 END DESC,
        |                    event_id DESC) AS rn
        |  FROM events)
        |WHERE rn = 1""".stripMargin,

    // Mirrors Merge.scd2History: lead + row_number over one window,
    // epoch_us ordering (matches Spark's microsecond truncation).
    "merge_scd2" ->
      """SELECT user_id, event_type, event_id, value,
        |       valid_from, valid_to, version
        |FROM (
        |  SELECT user_id, event_type, event_id, value,
        |         epoch_us(ts) AS valid_from,
        |         lead(epoch_us(ts)) OVER w AS valid_to,
        |         CAST(row_number() OVER w AS INTEGER) AS version
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id, event_type
        |               ORDER BY epoch_us(ts), event_id))""".stripMargin,

    "scalar_dates" ->
      """SELECT o_orderkey,
        |       strftime(o_orderdate, '%Y-%m-%d') AS order_date,
        |       CAST(year(o_orderdate) AS INTEGER) AS order_year,
        |       CAST(quarter(o_orderdate) AS INTEGER) AS order_quarter,
        |       CAST(month(o_orderdate) AS INTEGER) AS order_month,
        |       lower(trim(o_orderpriority)) AS priority_key
        |FROM orders""".stripMargin
  )
}
