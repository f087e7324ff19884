package graft

import graft.OracleCtes._

/** DuckDB twins for the [[AggQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object AggOracles {
  val map: Map[String, String] = Map(
    // Mirrors SketchState.hllRegisters (p=12): 60-bit hash from the
    // top 15 md5 hex chars (the split_assign posture), register = top
    // 12 bits, rank = leading zeros of the 48-bit window + 1 via the
    // binary-string length (w > 0; an all-zero window ranks 49) —
    // exact integers end to end, elementwise-max merged.
    "agg_hll_portable" ->
      """WITH h AS (
        |  SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
        |  FROM events WHERE user_id IS NOT NULL),
        |r AS (SELECT h // 281474976710656 AS reg_idx, h % 281474976710656 AS w
        |      FROM h)
        |SELECT reg_idx,
        |       CAST(max(CASE WHEN w > 0 THEN 49 - length(bin(w))
        |                     ELSE 49 END) AS BIGINT) AS max_rank
        |FROM r GROUP BY reg_idx""".stripMargin,

    // Mirrors SketchState.cmsCells (4 lanes × 512 buckets): per lane,
    // bucket = top-15-hex md5 of "<lane>_" ‖ key, mod 512 — exact
    // BIGINT end to end, cell-wise-addition mergeable.
    "agg_countmin" ->
      """WITH k AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |cells AS (
        |  SELECT lane,
        |         ('0x' || substr(md5(lane::VARCHAR || '_' || user_id::VARCHAR),
        |            1, 15))::BIGINT % 512 AS bucket
        |  FROM k CROSS JOIN generate_series(0, 3) t(lane))
        |SELECT CAST(lane AS INTEGER) AS lane, bucket,
        |       count(*) AS cnt
        |FROM cells GROUP BY 1, 2""".stripMargin,

    // Mirrors SketchState.bloomWords (2^15 bits × 4 lanes, 32 bits
    // per BIGINT word): per lane, position = top-15-hex md5 of
    // "b<lane>_" ‖ key mod 32768; words OR-merge. 32-bit packing
    // keeps every mask ≤ 2^31 — no sign-bit seam in either engine.
    "agg_bloom_portable" ->
      """WITH k AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |pos AS (
        |  SELECT ('0x' || substr(md5('b' || lane::VARCHAR || '_' || user_id::VARCHAR),
        |            1, 15))::BIGINT % 32768 AS p
        |  FROM k CROSS JOIN generate_series(0, 3) t(lane))
        |SELECT p // 32 AS word_idx,
        |       bit_or(1::BIGINT << CAST(p % 32 AS INTEGER)) AS bits
        |FROM pos GROUP BY 1""".stripMargin,

    // Mirrors aggCmsJoinCard: per-lane Σ cntA·cntB inner products of
    // the half-month CMS cell tables + the min-lane upper bound —
    // exact BIGINTs end to end (collisions only add, so every lane
    // bounds the true join size from above).
    "agg_cms_join_card" -> {
      def cells(name: String, pred: String) =
        s"""$name AS (
           |  SELECT lane,
           |         ('0x' || substr(md5(lane::VARCHAR || '_' || user_id::VARCHAR),
           |            1, 15))::BIGINT % 512 AS bucket,
           |         count(*) AS c
           |  FROM (SELECT user_id, ts FROM events
           |        WHERE user_id IS NOT NULL AND $pred)
           |  CROSS JOIN generate_series(0, 3) t(lane)
           |  GROUP BY 1, 2)""".stripMargin
      s"""WITH ${cells("ca", "day(ts) <= 15")},
         |${cells("cb", "day(ts) > 15")},
         |ip0 AS (SELECT ca.lane, CAST(sum(ca.c * cb.c) AS BIGINT) AS inner_product
         |        FROM ca JOIN cb USING (lane, bucket) GROUP BY 1),
         |ip AS (SELECT l.lane, coalesce(ip0.inner_product, 0) AS inner_product
         |       FROM (SELECT DISTINCT lane FROM ca) l
         |       LEFT JOIN ip0 USING (lane))
         |SELECT CAST(lane AS INTEGER) AS lane, inner_product,
         |       (SELECT min(inner_product) FROM ip) AS est
         |FROM ip""".stripMargin
    },

    // Mirrors aggCmsAccuracy: exact top-10 user counts vs the CMS
    // min-over-lanes point estimate — exact BIGINTs throughout, the
    // overcount is the sketch's one-sided error made visible.
    "agg_cms_accuracy" ->
      """WITH k AS (SELECT user_id FROM events WHERE user_id IS NOT NULL),
        |cells AS (
        |  SELECT lane,
        |         ('0x' || substr(md5(lane::VARCHAR || '_' || user_id::VARCHAR),
        |            1, 15))::BIGINT % 512 AS bucket,
        |         count(*) AS c
        |  FROM k CROSS JOIN generate_series(0, 3) t(lane)
        |  GROUP BY 1, 2),
        |exact AS (SELECT user_id, CAST(count(*) AS BIGINT) AS exact_count
        |          FROM k GROUP BY 1),
        |top AS (SELECT * FROM exact
        |        ORDER BY exact_count DESC, user_id ASC LIMIT 10),
        |probes AS (
        |  SELECT t.user_id, t.exact_count, lane,
        |         ('0x' || substr(md5(lane::VARCHAR || '_' || t.user_id::VARCHAR),
        |            1, 15))::BIGINT % 512 AS bucket
        |  FROM top t CROSS JOIN generate_series(0, 3) s(lane)),
        |est AS (SELECT p.user_id, p.exact_count,
        |          CAST(min(coalesce(c.c, 0)) AS BIGINT) AS estimate
        |        FROM probes p LEFT JOIN cells c
        |          ON p.lane = c.lane AND p.bucket = c.bucket
        |        GROUP BY 1, 2)
        |SELECT user_id, exact_count, estimate,
        |       estimate - exact_count AS overcount
        |FROM est""".stripMargin,

    // Mirrors aggHllOverlap: per-side and max-merged-union HLL
    // register summaries as exact BIGINTs (n_empty = 4096 − nonzero
    // registers; sum_scaled = Σ 2^(49 − max_rank) with empty
    // registers at 2^49) — the estimator's libm half stays in the
    // spec.
    "agg_hll_overlap" -> {
      def regs(pred: String) =
        s"""SELECT h // 281474976710656 AS reg_idx,
           |       CAST(max(CASE WHEN h % 281474976710656 > 0
           |                     THEN 49 - length(bin(h % 281474976710656))
           |                     ELSE 49 END) AS BIGINT) AS max_rank
           |FROM (SELECT ('0x' || substr(md5(user_id::VARCHAR), 1, 15))::BIGINT AS h
           |      FROM events WHERE user_id IS NOT NULL AND $pred)
           |GROUP BY 1""".stripMargin
      def stats(src: String, suffix: String) =
        s"""SELECT CAST(4096 - count(*) AS BIGINT) AS n_empty_$suffix,
           |       CAST(coalesce(sum(1::BIGINT << CAST(49 - max_rank AS INTEGER)), 0)
           |            + (4096 - count(*)) * (1::BIGINT << 49) AS BIGINT)
           |         AS sum_scaled_$suffix
           |FROM $src""".stripMargin
      s"""WITH ra AS (${regs("event_type = 'view'")}),
         |rb AS (${regs("event_type = 'purchase'")}),
         |ru AS (SELECT reg_idx, max(max_rank) AS max_rank
         |       FROM (SELECT * FROM ra UNION ALL SELECT * FROM rb)
         |       GROUP BY 1),
         |sa AS (${stats("ra", "a")}),
         |sb AS (${stats("rb", "b")}),
         |su AS (${stats("ru", "union")})
         |SELECT * FROM sa CROSS JOIN sb CROSS JOIN su""".stripMargin
    },

    "set_except" ->
      """SELECT DISTINCT user_id FROM events WHERE day(ts) <= 15
        |EXCEPT
        |SELECT DISTINCT user_id FROM events WHERE day(ts) > 15""".stripMargin,

    "set_intersect" ->
      """SELECT DISTINCT user_id FROM events
        | WHERE event_type = (SELECT min(event_type) FROM events)
        |INTERSECT
        |SELECT DISTINCT user_id FROM events
        | WHERE event_type <> (SELECT min(event_type) FROM events)""".stripMargin,

    "agg_salted" ->
      s"""SELECT event_type,
        |       $exactAvgSql AS value,
        |       count(value) AS observation_count
        |FROM events GROUP BY 1""".stripMargin,

    // Mirrors joinSalted: salting is plan-internal, so the twin is the
    // PLAIN lineitem⋈orders aggregate.
    "join_salted" ->
      """SELECT o_orderpriority, count(*) AS n_items,
        |       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS DOUBLE)
        |         / 100 AS total_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1""".stripMargin,

    // Mirrors aggQuantiles: same (n−1)·q linear interpolation over the
    // micro-scaled integers, descaled, one scalar row per quartile
    // (UNION ALL of the three quantile_cont calls ≡ posexplode'd array).
    "agg_quantiles" ->
      """WITH s AS (SELECT event_type,
        |                  CAST(round(value * 1000000) AS BIGINT) AS v
        |           FROM events)
        |SELECT event_type, 25 AS q_pct, quantile_cont(v, 0.25) / 1000000 AS value
        |FROM s GROUP BY 1
        |UNION ALL
        |SELECT event_type, 50 AS q_pct, quantile_cont(v, 0.5) / 1000000 AS value
        |FROM s GROUP BY 1
        |UNION ALL
        |SELECT event_type, 75 AS q_pct, quantile_cont(v, 0.75) / 1000000 AS value
        |FROM s GROUP BY 1""".stripMargin,

    "agg_rollup" ->
      """SELECT event_type, CAST(day(ts) AS INTEGER) AS observation_day,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events
        |GROUP BY ROLLUP(event_type, CAST(day(ts) AS INTEGER))""".stripMargin,

    "agg_cube" ->
      """SELECT event_type, CAST(day(ts) AS INTEGER) AS observation_day,
        |       count(*) AS n,
        |       CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / 1000000 AS value_sum
        |FROM events
        |GROUP BY CUBE(event_type, CAST(day(ts) AS INTEGER))""".stripMargin,

    // Mirrors aggMode: count-desc/id-asc tiebreak makes the mode unique.
    "agg_mode" ->
      """SELECT event_type, user_id, n FROM (
        |  SELECT event_type, user_id, count(*) AS n,
        |         row_number() OVER (PARTITION BY event_type
        |           ORDER BY count(*) DESC, user_id ASC) AS rk
        |  FROM events GROUP BY 1, 2)
        |WHERE rk = 1""".stripMargin,

    // Mirrors pivotDaily's explicit value list, one CASE sum per type.
    "pivot_daily" ->
      """SELECT CAST(day(ts) AS INTEGER) AS observation_day,
        |       CAST(sum(CASE WHEN event_type = 'click' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS click,
        |       CAST(sum(CASE WHEN event_type = 'error' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS error,
        |       CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS purchase,
        |       CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS signup,
        |       CAST(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS "view"
        |FROM events GROUP BY 1""".stripMargin,

    // Mirrors unpivotDaily: explicit UNION ALL melt of the pivot
    // (engine UNPIVOT null defaults differ; nulls dropped both sides).
    "unpivot_daily" ->
      """WITH p AS (
        |  SELECT CAST(day(ts) AS INTEGER) AS observation_day,
        |         CAST(sum(CASE WHEN event_type = 'click' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS click,
        |         CAST(sum(CASE WHEN event_type = 'error' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS error,
        |         CAST(sum(CASE WHEN event_type = 'purchase' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS purchase,
        |         CAST(sum(CASE WHEN event_type = 'signup' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS signup,
        |         CAST(sum(CASE WHEN event_type = 'view' THEN CAST(round(value * 1000000) AS BIGINT) END) AS DOUBLE) / 1000000 AS "view"
        |  FROM events GROUP BY 1)
        |SELECT observation_day, 'click' AS event_type, click AS value_sum FROM p WHERE click IS NOT NULL
        |UNION ALL
        |SELECT observation_day, 'error', error FROM p WHERE error IS NOT NULL
        |UNION ALL
        |SELECT observation_day, 'purchase', purchase FROM p WHERE purchase IS NOT NULL
        |UNION ALL
        |SELECT observation_day, 'signup', signup FROM p WHERE signup IS NOT NULL
        |UNION ALL
        |SELECT observation_day, 'view', "view" FROM p WHERE "view" IS NOT NULL""".stripMargin,

    // agg_approx_percentile emits per (group, quartile) the exact
    // group size plus the GK rank-contract check |r − q·n| ≤
    // n/accuracy + 1, asserted TRUE here.
    "agg_approx_percentile" ->
      """SELECT event_type, q_pct, n, TRUE AS rank_ok
        |FROM (SELECT event_type, count(*) AS n FROM events GROUP BY 1)
        |CROSS JOIN (VALUES (25), (50), (75)) q(q_pct)""".stripMargin,

    // Mirrors Dedup.editDistancePairs: canonical text, 16-CHAR prefix
    // block + length band (a Levenshtein lower bound), exact verify.
    // DuckDB length() counts characters like Spark length() — strlen
    // counts BYTES and diverges on multi-byte text (r4 ADVICE #3).
    "dedup_editdist" ->
      """WITH c AS (
        |  SELECT doc_id,
        |         regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS canon
        |  FROM documents)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       CAST(levenshtein(a.canon, b.canon) AS INTEGER) AS dist
        |FROM c a JOIN c b
        |  ON substr(a.canon, 1, 16) = substr(b.canon, 1, 16)
        | AND a.doc_id < b.doc_id
        | AND abs(length(a.canon) - length(b.canon)) <= 8
        |WHERE levenshtein(a.canon, b.canon) <= 8""".stripMargin
  )
}
