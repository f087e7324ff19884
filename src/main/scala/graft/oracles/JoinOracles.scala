package graft

import graft.OracleCtes._

/** DuckDB twins for the [[JoinQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object JoinOracles {
  val map: Map[String, String] = Map(
    "join_star_revenue" ->
      """SELECT r_name, n_name,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
        |                (100 - CAST(round(l_discount * 100) AS BIGINT))) AS DOUBLE) / 10000 AS revenue,
        |       count(*) AS n_rows
        |FROM lineitem
        |JOIN orders   ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation   ON c_nationkey = n_nationkey
        |JOIN region   ON n_regionkey = r_regionkey
        |WHERE o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate <  TIMESTAMP '1998-01-01'
        |GROUP BY 1, 2""".stripMargin,

    "join_semi" ->
      """SELECT c_custkey, c_name FROM customer c
        |WHERE EXISTS (SELECT 1 FROM orders o
        |              WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F')""".stripMargin,

    // Mirrors joinLeftOuter: LEFT JOIN against the filtered dim, null
    // extension counted per side (sum skips null balances identically).
    "join_left_outer" ->
      """SELECT o_orderstatus,
        |       count(*) AS n_orders,
        |       count(c_custkey) AS n_matched,
        |       CAST(sum(CASE WHEN c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
        |         AS n_unmatched,
        |       CAST(sum(CAST(round(c_acctbal * 1000000) AS BIGINT)) AS DOUBLE)
        |         / 1000000 AS bal_sum
        |FROM orders
        |LEFT OUTER JOIN (SELECT c_custkey, c_acctbal FROM customer
        |                 WHERE c_mktsegment = 'BUILDING') c
        |  ON o_custkey = c_custkey
        |GROUP BY 1""".stripMargin,

    // Mirrors joinFullOuter: USING coalesces the key in both engines.
    "join_full_outer" ->
      """SELECT user_id, n_clicks, n_purchases
        |FROM (SELECT user_id, count(*) AS n_clicks FROM events
        |      WHERE event_type = 'click' GROUP BY 1) c
        |FULL OUTER JOIN
        |     (SELECT user_id, count(*) AS n_purchases FROM events
        |      WHERE event_type = 'purchase' GROUP BY 1) p
        |USING (user_id)""".stripMargin,

    "topk_orders" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin
  )
}
