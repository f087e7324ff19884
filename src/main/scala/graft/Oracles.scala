package graft

/** DuckDB oracle SQL — one entry per oracle-checkable query in
  * [[Queries]]. Each statement is the ANSI-SQL twin of the Spark plan:
  * identical column NAMES and (post-cast) types, identical rounding
  * applied to every derived double, identical tiebreaks on every rank.
  *
  * Queries absent here (minhash/simhash/winnowing fingerprints, HLL
  * approx counts, mapPartitions decode) use engine-specific hash
  * families or estimators and get the driver's rows-only check; their
  * exact semantics are locked by ScalaTest specs instead.
  */
object Oracles {

  // Exact average: BIGINT micro-sum then IEEE divisions — bit-identical
  // to Spark's plan (see Queries.exactAvg).
  private val exactAvgSql =
    "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / count(value) / 1000000"

  private val dailySilverCte =
    s"""SELECT event_type AS indicator,
      |       CAST(year(ts) AS INTEGER) AS observation_year,
      |       CAST(month(ts) AS INTEGER) AS observation_month,
      |       CAST(day(ts) AS INTEGER) AS observation_day,
      |       $exactAvgSql AS value,
      |       count(value) AS observation_count
      |FROM events GROUP BY 1, 2, 3, 4""".stripMargin

  private val dailySeriesCte =
    s"SELECT indicator, observation_day, value FROM ($dailySilverCte)"

  // ASCII-whitespace tokenizer — the SQL twin of TextOps.tokens /
  // HashedWordShingles.tokenSpans: split on runs of [ \t\n\x0B\f\r]
  // (Java `\s` spelled out — RE2's `\s` omits \x0B), empty tokens
  // (leading/trailing whitespace) dropped.
  private def wsToks(c: String): String =
    s"list_filter(regexp_split_to_array($c, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '')"

  // Total characters across tokens — the whitespace-robust twin of
  // TextOps.tokenCharSum (empty token list sums to 0, like the Spark
  // aggregate's 0 init).
  private def tokCharSum(toks: String): String =
    s"coalesce(list_sum(list_transform($toks, t -> length(t))), 0)"

  // The n-gram Jaccard pair query — used standalone (dedup_ngram) and
  // as the edge set of the connected-components oracle.
  private val dedupNgramSql =
    s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                        for i in generate_series(1, len(toks) - 2)]) AS s
      |       FROM w WHERE len(toks) >= 3),
      |ex_all AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
      |hot AS (SELECT shingle FROM ex_all GROUP BY 1 HAVING count(*) > 50),
      |ex AS (SELECT * FROM ex_all
      |       WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.shingle = ex_all.shingle)),
      |inter AS (
      |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
      |  FROM ex a JOIN ex b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2),
      |sz AS (SELECT doc_id, count(*) AS n_sh FROM ex GROUP BY 1)
      |SELECT id_a, id_b,
      |       round(CAST(n_inter * 10000 AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)) / 10000 AS jaccard
      |FROM inter
      |JOIN sz sa ON sa.doc_id = id_a
      |JOIN sz sb ON sb.doc_id = id_b
      |WHERE round(CAST(n_inter * 10000 AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)) / 10000 >= 0.5""".stripMargin

  // 2^61 − 1 — every ordered value of the portable hash family lives
  // under this Mersenne prime (see functions.PortableHash).
  private val pSql = graft.functions.PortableHash.PSql

  // DuckDB twin of the PortableHash minhash machinery: 61-bit shingle
  // hashes (md5_number_lower % P — bit-identical to the JVM
  // md5Lower64/modP pair), 64 affine lanes with md5-derived
  // coefficients rebuilt in SQL, and 16 four-lane band keys. Band
  // keys are the SAME portable Horner fold as the Spark side
  // (functions.MinHashBandKeys: acc ← (acc·B + lane) mod P;
  // list_reduce's first-element init ≡ acc₀ = 0), so both engines
  // generate IDENTICAL candidate sets by construction — no
  // engine-specific hash anywhere in the plan. Parameterized by the
  // document source so curate_corpus_near can run it over its
  // quality-kept subset.
  private def minhashCtes(source: String): String =
    s"""toks AS (SELECT doc_id, ${wsToks("text")} AS toks FROM $source),
       |sh AS (SELECT doc_id,
       |         list_distinct([
       |           (md5_number_lower(toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
       |              % $pSql::UBIGINT)::BIGINT
       |           for i in generate_series(1, len(toks) - 2)]) AS s
       |       FROM toks WHERE len(toks) >= 3),
       |lanes AS (SELECT j,
       |            (md5_number_lower('a' || j) % ($pSql::UBIGINT - 1) + 1)::HUGEINT AS a,
       |            (md5_number_lower('b' || j) % $pSql::UBIGINT)::HUGEINT AS b
       |          FROM generate_series(0, 63) t(j)),
       |ex AS (SELECT doc_id, unnest(s) AS h FROM sh),
       |sig AS (SELECT doc_id, j, min((a * h + b) % $pSql) AS m
       |        FROM ex CROSS JOIN lanes GROUP BY doc_id, j),
       |bands AS (SELECT doc_id, j // 4 AS band_idx,
       |            list_reduce(list(m::HUGEINT ORDER BY j),
       |              (acc, c) -> (acc * ${graft.functions.PortableHash.GramBase} + c)
       |                          % $pSql)::BIGINT AS band_key
       |          FROM sig GROUP BY doc_id, j // 4)""".stripMargin

  // LSH pair screen over the `bands`/`sh` CTEs of [[minhashCtes]]:
  // maxBucket=200 giant-bucket exclusion, candidates on band equality,
  // exact-Jaccard verify ≥ 0.5. Final relation `lshp(id_a, id_b,
  // jaccard)` — shared by dedup_minhash_lsh and split_leakage.
  /** Unrolled BPE training stages (mirrors ext.Bpe.trainMerges): w0 is
    * the word-frequency table with '~'-joined character symbols; each
    * stage counts adjacent symbol pairs frequency-weighted (p_i), takes
    * the winner under the pinned (count DESC, lhs, rhs) order (b_i),
    * and applies it as a literal replace (w_i) — guarded so a stage
    * with no pairs left is a no-op emitting no merge row, exactly the
    * trainer's early-stop. SQL generated by loop because the stage
    * count is the model's hyperparameter, not prose. Every stage CTE
    * is AS MATERIALIZED: DuckDB inlines plain CTEs, and a chain where
    * each stage reads its predecessor 2-3× expands exponentially
    * (measured: "too many open files" from hundreds of re-opens of the
    * corpus scan at depth 8). */
  private def bpeCtes(n: Int): String = {
    val w0 =
      """w0 AS MATERIALIZED (
        |  SELECT word, array_to_string(string_split(word, ''), '~') AS symbols,
        |         CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |          '[^\p{L}\p{N}]+'), x -> len(x) > 0)) AS word FROM documents)
        |  GROUP BY 1, 2)""".stripMargin
    val stages = (1 to n).map { i =>
      s"""p$i AS MATERIALIZED (SELECT z[1] AS l, z[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_zip(t[:-2], t[2:])) AS z
         |        FROM (SELECT string_split(symbols, '~') AS t, freq FROM w${i - 1}))
         |  GROUP BY 1, 2),
         |b$i AS MATERIALIZED (SELECT l, r, cnt FROM p$i ORDER BY cnt DESC, l ASC, r ASC LIMIT 1),
         |w$i AS MATERIALIZED (SELECT word,
         |    CASE WHEN (SELECT count(*) FROM b$i) = 0 THEN symbols
         |         ELSE replace(symbols, (SELECT l || '~' || r FROM b$i),
         |                      (SELECT l || r FROM b$i)) END AS symbols,
         |    freq FROM w${i - 1})""".stripMargin
    }
    (w0 +: stages).mkString(",\n")
  }

  private val lshPairCtes: String =
    """ok AS (SELECT band_idx, band_key FROM bands
      |       GROUP BY 1, 2 HAVING count(*) <= 200),
      |b2 AS (SELECT bands.* FROM bands JOIN ok USING (band_idx, band_key)),
      |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
      |         FROM b2 a JOIN b2 b
      |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
      |          AND a.doc_id < b.doc_id),
      |lshp AS (SELECT id_a, id_b, jaccard FROM (
      |  SELECT id_a, id_b,
      |         round(len(list_intersect(sa.s, sb.s)) * 10000.0 /
      |               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))) / 10000 AS jaccard
      |  FROM cand JOIN sh sa ON sa.doc_id = id_a JOIN sh sb ON sb.doc_id = id_b)
      |  WHERE jaccard >= 0.5)""".stripMargin

  // Three rounds of the star-contraction label propagation (the
  // catalog's iters=3, which small corpora converge inside — the early
  // fixpoint exit makes extra rounds identity), then singleton docs
  // (< 3 tokens, no buckets) as their own clusters.
  private def minhashClusterCtes(keptSource: String): String =
    s"""l0 AS (SELECT doc_id, doc_id AS lbl FROM sh),
       |bm1 AS (SELECT band_idx, band_key, min(lbl) AS bmin
       |        FROM bands JOIN l0 USING (doc_id) GROUP BY 1, 2),
       |l1 AS (SELECT doc_id, min(bmin) AS lbl
       |       FROM bands JOIN bm1 USING (band_idx, band_key) GROUP BY doc_id),
       |bm2 AS (SELECT band_idx, band_key, min(lbl) AS bmin
       |        FROM bands JOIN l1 USING (doc_id) GROUP BY 1, 2),
       |l2 AS (SELECT doc_id, min(bmin) AS lbl
       |       FROM bands JOIN bm2 USING (band_idx, band_key) GROUP BY doc_id),
       |bm3 AS (SELECT band_idx, band_key, min(lbl) AS bmin
       |        FROM bands JOIN l2 USING (doc_id) GROUP BY 1, 2),
       |l3 AS (SELECT doc_id, min(bmin) AS lbl
       |       FROM bands JOIN bm3 USING (band_idx, band_key) GROUP BY doc_id),
       |singletons AS (SELECT doc_id FROM $keptSource
       |               WHERE doc_id NOT IN (SELECT doc_id FROM sh))""".stripMargin

  // DuckDB twin of functions.WinnowingFingerprint: k code-point grams
  // hashed with the rolling polynomial (Horner via list_reduce — the
  // first element doubles as the init, ≡ acc=0 Horner), window-of-w
  // minima, distinct set. Zero-length docs hash as the single empty
  // gram 0, mirroring the expression's substr-past-end semantics.
  private def winnowCtes(k: Int, w: Int): String = {
    val b = graft.functions.PortableHash.GramBase
    s"""g AS (
       |  SELECT doc_id,
       |    CASE WHEN length(text) = 0 THEN [0::BIGINT]
       |    ELSE [list_reduce([unicode(substr(text, j, 1))::HUGEINT
       |            for j in generate_series(i, least(i + ${k - 1}, length(text)))],
       |           (acc, c) -> (acc * $b + c) % $pSql)::BIGINT
       |          for i in generate_series(1, greatest(length(text) - ${k - 1}, 1))]
       |    END AS grams
       |  FROM documents),
       |m AS (SELECT doc_id,
       |        list_distinct([list_min(grams[i:i+${w - 1}]) for i in
       |          generate_series(1, greatest(len(grams) - ${w - 1}, 1))]) AS fps
       |      FROM g)""".stripMargin
  }

  private val decontamOverlapSql =
    s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
      |sh AS (SELECT doc_id,
      |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
      |                          || ' ' || toks[i+3] || ' ' || toks[i+4]
      |                        for i in generate_series(1, len(toks) - 4)]) AS s
      |       FROM w WHERE len(toks) >= 5),
      |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 20 = 0),
      |train AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n_sh, unnest(s) AS shingle
      |          FROM sh WHERE doc_id % 20 <> 0)
      |SELECT doc_id, n_sh, count(*) AS n_overlap,
      |       round(CAST(count(*) * 10000 AS DOUBLE) / n_sh) / 10000 AS contamination
      |FROM train JOIN bench USING (shingle)
      |GROUP BY doc_id, n_sh""".stripMargin

  // Brute-force cosine top-10 for the vec_id<5 query set — shared by
  // similarity_topk and (≡ by construction) similarity_ivf_exhaustive.
  private val similarityTopkSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |q AS (SELECT * FROM e WHERE vec_id < 5),
      |scored AS (
      |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
      |         round(list_dot_product(q.v, c.v) /
      |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) * 10000) / 10000 AS cosine
      |  FROM e c CROSS JOIN q WHERE q.vec_id <> c.vec_id)
      |SELECT query_id, neighbor_id, cosine, rank FROM (
      |  SELECT *, CAST(row_number() OVER (
      |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
      |  FROM scored)
      |WHERE rank <= 10""".stripMargin

  // Per-column null/distinct profile — the profile_columns twin,
  // reused (exact columns + TRUE bound flag) by
  // profile_columns_approx's check form.
  private val profileColumnsSql =
    """WITH e AS (SELECT event_id, epoch_us(ts) AS ts_us, user_id,
      |                  event_type, value FROM events),
      |a AS (
      |  SELECT count(*) AS n_rows,
      |         CAST(sum(CASE WHEN event_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn0,
      |         count(DISTINCT event_id) AS nd0,
      |         CAST(sum(CASE WHEN ts_us IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn1,
      |         count(DISTINCT ts_us) AS nd1,
      |         CAST(sum(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn2,
      |         count(DISTINCT user_id) AS nd2,
      |         CAST(sum(CASE WHEN event_type IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn3,
      |         count(DISTINCT event_type) AS nd3,
      |         CAST(sum(CASE WHEN value IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn4,
      |         count(DISTINCT value) AS nd4
      |  FROM e)
      |SELECT "column", n_nulls, n_distinct, n_rows FROM (
      |  SELECT 'event_id' AS "column", nn0 AS n_nulls, nd0 AS n_distinct, n_rows FROM a
      |  UNION ALL SELECT 'ts_us', nn1, nd1, n_rows FROM a
      |  UNION ALL SELECT 'user_id', nn2, nd2, n_rows FROM a
      |  UNION ALL SELECT 'event_type', nn3, nd3, n_rows FROM a
      |  UNION ALL SELECT 'value', nn4, nd4, n_rows FROM a)""".stripMargin

  // All vector pairs at cosine ≥ 0.4 — the similarity_lsh_exhaustive
  // twin, reused as the exact denominator of similarity_lsh's
  // recall check.
  private val lshExhaustiveSql =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
      |SELECT id_a, id_b, cosine FROM (
      |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
      |         round(list_dot_product(a.v, b.v) /
      |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
      |  FROM e a JOIN e b ON a.vec_id < b.vec_id)
      |WHERE cosine >= 0.4""".stripMargin

  // DuckDB twin of operators.ZOrder.interleave: the Morton bit-
  // interleave as explicit shift/mask/OR arithmetic over the scaled
  // dimension expressions.
  private def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")

  val all: Map[String, String] = Map(

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

    "fred_yearly_gold" ->
      s"""WITH silver AS ($dailySilverCte)
         |SELECT indicator, observation_year, observation_month, observation_day,
         |       round_even(value, 2) AS value, observation_count
         |FROM (
         |  SELECT * FROM silver WHERE observation_day <= 15
         |  UNION ALL
         |  SELECT * FROM silver WHERE observation_day > 15
         |)""".stripMargin,

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
        |FROM orders""".stripMargin,

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
        |ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 10""".stripMargin,

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

    // Mirrors Profile.histogram: identical IEEE bucket arithmetic, so
    // edge-landing values bucket identically.
    "agg_histogram" ->
      """SELECT event_type, bucket, count(*) AS n,
        |       0.0 + bucket * 10.0 AS bucket_lo
        |FROM (
        |  SELECT event_type,
        |         CASE WHEN value < 0.0 THEN -1
        |              WHEN value >= 500.0 THEN 50
        |              ELSE CAST(floor((value - 0.0) / 10.0) AS INTEGER) END AS bucket
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,

    // Mirrors aggEquidepth: ntile over the same (micro-value, id)
    // total order; both engines give remainder rows to early buckets.
    "agg_equidepth" ->
      """SELECT event_type, bucket, count(*) AS n,
        |       min(value) AS lo, max(value) AS hi
        |FROM (
        |  SELECT event_type, value,
        |         CAST(ntile(10) OVER (PARTITION BY event_type
        |           ORDER BY CAST(round(value * 1000000) AS BIGINT), event_id)
        |           AS INTEGER) AS bucket
        |  FROM events)
        |GROUP BY 1, 2""".stripMargin,

    // Mirrors Profile.moments: cents-scaled HUGEINT power sums (exact,
    // order-free), single double conversion at the end, same 4-dp
    // integer-scaled rounding.
    "agg_stats_moments" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |         sum(CAST(round(value * 100) AS HUGEINT)) AS s1,
        |         sum(CAST(round(value * 100) AS HUGEINT)
        |             * CAST(round(value * 100) AS HUGEINT)) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        |       CAST(s1 AS DOUBLE) / n / 100 AS mean,
        |       CASE WHEN n > 1 THEN
        |         round(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |               / CAST(n * (n - 1) AS DOUBLE)) / 10000 END AS var_samp,
        |       CASE WHEN n > 1 THEN
        |         round(sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |                    / CAST(n * (n - 1) AS DOUBLE) / 10000) * 10000) / 10000
        |         END AS stddev_samp
        |FROM m""".stripMargin,

    // Mirrors Profile.pearsonCorr over (value, day): five exact integer
    // partials, closed-form ratio, 4-dp integer-scaled rounding.
    "agg_corr" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |         sum(CAST(round(value * 100) AS HUGEINT)) AS sx,
        |         sum(CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)) AS sy,
        |         sum(CAST(round(value * 100) AS HUGEINT)
        |             * CAST(round(value * 100) AS HUGEINT)) AS sxx,
        |         sum(CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)
        |             * CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)) AS syy,
        |         sum(CAST(round(value * 100) AS HUGEINT)
        |             * CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)) AS sxy
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        |       CASE WHEN n * sxx - sx * sx > 0 AND n * syy - sy * sy > 0 THEN
        |         round(CAST(n * sxy - sx * sy AS DOUBLE)
        |               / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
        |                  * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) * 10000) / 10000
        |         END AS corr
        |FROM m""".stripMargin,

    // Mirrors Profile.linearFit: same power sums as agg_corr; the
    // intercept chain reuses the unrounded slope operation-for-
    // operation, descaled last.
    "agg_linfit" ->
      """WITH m AS (
        |  SELECT event_type, count(*) AS n,
        |         sum(CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)) AS sx,
        |         sum(CAST(round(value * 100) AS HUGEINT)) AS sy,
        |         sum(CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)
        |             * CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)) AS sxx,
        |         sum(CAST(round(CAST(day(ts) AS DOUBLE) * 100) AS HUGEINT)
        |             * CAST(round(value * 100) AS HUGEINT)) AS sxy
        |  FROM events GROUP BY 1)
        |SELECT event_type, n,
        |       CASE WHEN n * sxx - sx * sx > 0 THEN
        |         round(CAST(n * sxy - sx * sy AS DOUBLE)
        |               / CAST(n * sxx - sx * sx AS DOUBLE) * 10000) / 10000
        |         END AS slope,
        |       CASE WHEN n * sxx - sx * sx > 0 THEN
        |         round((CAST(sy AS DOUBLE)
        |                - CAST(n * sxy - sx * sy AS DOUBLE)
        |                  / CAST(n * sxx - sx * sx AS DOUBLE)
        |                  * CAST(sx AS DOUBLE)) / n / 100 * 10000) / 10000
        |         END AS intercept
        |FROM m""".stripMargin,

    // Mirrors Profile.mad: exact medians in HALF-micro integer space
    // (2x₆ and round(2m) are integers), single descale divisions.
    "agg_mad" ->
      """WITH x AS (SELECT event_type,
        |                  CAST(round(value * 1000000) AS BIGINT) AS x6
        |           FROM events),
        |m AS (SELECT event_type, quantile_cont(x6, 0.5) AS m6
        |      FROM x GROUP BY 1),
        |d AS (SELECT x.event_type, m6,
        |             abs(x6 * 2 - CAST(round(m6 * 2) AS BIGINT)) AS d2
        |      FROM x JOIN m USING (event_type))
        |SELECT event_type,
        |       min(m6 / 1000000) AS median,
        |       quantile_cont(d2, 0.5) / 2000000 AS mad
        |FROM d GROUP BY 1""".stripMargin,

    // Mirrors Profile.winsorize: micro-scaled exact quartiles (same
    // interpolation as agg_quantiles), broadcast clamp.
    "scalar_winsorize" ->
      """WITH b AS (
        |  SELECT event_type,
        |         quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.25)
        |           / 1000000 AS lo,
        |         quantile_cont(CAST(round(value * 1000000) AS BIGINT), 0.75)
        |           / 1000000 AS hi
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |       least(greatest(value, lo), hi) AS value_w
        |FROM events JOIN b USING (event_type)""".stripMargin,

    // Mirrors Profile.zscore: same power sums as agg_stats_moments,
    // every IEEE step from integer sums to z mirrored in order.
    "scalar_zscore" ->
      """WITH st AS (
        |  SELECT event_type, count(*) AS n,
        |         sum(CAST(round(value * 100) AS HUGEINT)) AS s1,
        |         sum(CAST(round(value * 100) AS HUGEINT)
        |             * CAST(round(value * 100) AS HUGEINT)) AS s2
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |       CASE WHEN n > 1 AND n * s2 - s1 * s1 > 0 THEN
        |         round((value - CAST(s1 AS DOUBLE) / n / 100)
        |               / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE)
        |                      / CAST(n * (n - 1) AS DOUBLE) / 10000)
        |               * 10000) / 10000
        |         END AS zscore
        |FROM events JOIN st USING (event_type)""".stripMargin,

    // Mirrors Clean.imputeGroupMean over the fred_clean_cast extract
    // chain: sentinel → try_cast, per-type exact mean fills nulls.
    "scalar_impute" ->
      """WITH x AS (
        |  SELECT event_id, event_type,
        |         TRY_CAST(CASE WHEN json_extract_string(props, '$.k') = '.'
        |                       THEN NULL
        |                       ELSE json_extract_string(props, '$.k') END
        |                  AS DOUBLE) AS k
        |  FROM events),
        |m AS (SELECT event_type,
        |             CAST(sum(CAST(round(k * 1000000) AS BIGINT)) AS DOUBLE)
        |               / count(k) / 1000000 AS mean
        |      FROM x GROUP BY 1)
        |SELECT event_id, event_type, k,
        |       coalesce(k, mean) AS k_filled,
        |       CAST(k IS NULL AND mean IS NOT NULL AS INTEGER) AS was_imputed
        |FROM x JOIN m USING (event_type)""".stripMargin,

    // Mirrors Sampling.stratified: same md5 60-bit bucket as
    // split_assign, thresholded per stratum.
    "sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
        |           % 100 AS INTEGER)
        |      < CASE lang WHEN 'en' THEN 10 WHEN 'es' THEN 50 ELSE 100 END""".stripMargin,

    // Mirrors Sampling.hashSample: same md5 60-bit bucket, fixed 25%.
    "sample_hash" ->
      """SELECT doc_id, lang, source FROM documents
        |WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
        |           % 100 AS INTEGER) < 25""".stripMargin,

    // Mirrors Sampling.capPerGroup: k smallest md5(key‖salt) per group,
    // key tiebreak (hex strings compare identically in both engines).
    "sample_cap_per_group" ->
      """SELECT doc_id, source, sample_rank FROM (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY md5(doc_id::VARCHAR || 'graft'), doc_id) AS INTEGER)
        |           AS sample_rank
        |  FROM documents)
        |WHERE sample_rank <= 10""".stripMargin,

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

    "window_mom" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       value - lag(value) OVER (
         |         PARTITION BY indicator ORDER BY observation_day) AS change
         |FROM d""".stripMargin,

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

    "window_rank_share" ->
      s"""WITH d AS ($dailySeriesCte)
         |SELECT indicator, observation_day, value,
         |       CAST(rank() OVER (
         |         PARTITION BY indicator
         |         ORDER BY value DESC, observation_day) AS INTEGER) AS day_rank,
         |       round(value * 10000 / sum(value) OVER (PARTITION BY indicator)) / 10000 AS share
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

    // Mirrors Profile.expectations: one scan, CASE sums per rule,
    // null predicate counts as violation, unfolded to rows.
    "quality_expectations" ->
      """WITH a AS (
        |  SELECT count(*) AS n_rows,
        |         CAST(sum(CASE WHEN coalesce(value >= 0, false) THEN 0 ELSE 1 END) AS BIGINT) AS v0,
        |         CAST(sum(CASE WHEN coalesce(value < 1000, false) THEN 0 ELSE 1 END) AS BIGINT) AS v1,
        |         CAST(sum(CASE WHEN user_id IS NOT NULL THEN 0 ELSE 1 END) AS BIGINT) AS v2,
        |         CAST(sum(CASE WHEN coalesce(event_type IN ('click','error','purchase','signup','view'), false) THEN 0 ELSE 1 END) AS BIGINT) AS v3
        |  FROM events)
        |SELECT rule, n_violations, n_rows,
        |       round(n_violations * 10000.0 / n_rows) / 10000 AS violation_pct
        |FROM (
        |  SELECT 'value_non_negative' AS rule, v0 AS n_violations, n_rows FROM a
        |  UNION ALL SELECT 'value_below_1000', v1, n_rows FROM a
        |  UNION ALL SELECT 'user_id_present', v2, n_rows FROM a
        |  UNION ALL SELECT 'known_event_type', v3, n_rows FROM a)""".stripMargin,

    // Mirrors Profile.columnProfile: per-column null/distinct counts
    // in one logical pass, ts at microsecond grain like the engine.
    "profile_columns" -> profileColumnsSql,

    // profile_columns_approx carries the exact profile (portable)
    // plus the Spark-side HLL bound check per column, asserted TRUE.
    "profile_columns_approx" ->
      s"""SELECT "column", n_nulls, n_distinct, n_rows, TRUE AS approx_ok
         |FROM ($profileColumnsSql)""".stripMargin,

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

    // Mirrors SeriesOps.cohortRetention: distinct (user, month)
    // activity, cohort = first active month, cell = distinct actives
    // per (cohort, month offset), normalized by cohort size.
    "events_retention" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             date_trunc('month', ts) AS m FROM events),
        |c AS (SELECT user_id, min(m) AS cohort FROM a GROUP BY 1),
        |cells AS (
        |  SELECT cohort, CAST(datediff('month', cohort, m) AS BIGINT) AS "offset",
        |         count(DISTINCT user_id) AS n_active
        |  FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort, n_active AS size FROM cells WHERE "offset" = 0)
        |SELECT cohort, "offset", n_active,
        |       round(CAST(n_active * 10000 AS DOUBLE) / size) / 10000 AS retained_pct
        |FROM cells JOIN sz USING (cohort)""".stripMargin,

    // Mirrors SeriesOps.cohortRetentionBy(week): Monday-truncated
    // weeks in both engines; offsets as exact day differences // 7
    // (always divisible on week floors).
    "events_retention_weekly" ->
      """WITH a AS (SELECT DISTINCT user_id,
        |             date_trunc('week', ts) AS m FROM events),
        |c AS (SELECT user_id, min(m) AS cohort FROM a GROUP BY 1),
        |cells AS (
        |  SELECT cohort, CAST(datediff('day', cohort, m) // 7 AS BIGINT) AS "offset",
        |         count(DISTINCT user_id) AS n_active
        |  FROM a JOIN c USING (user_id) GROUP BY 1, 2),
        |sz AS (SELECT cohort, n_active AS size FROM cells WHERE "offset" = 0)
        |SELECT cohort, "offset", n_active,
        |       round(CAST(n_active * 10000 AS DOUBLE) / size) / 10000 AS retained_pct
        |FROM cells JOIN sz USING (cohort)""".stripMargin,

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

    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
        |       min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,

    // Mirrors ngramJaccardPairs including the maxDocFreq=50 hot-shingle
    // cap: shingles in >50 docs are dropped BEFORE the self-join, and
    // Jaccard uses the retained set sizes.
    "dedup_ngram" -> dedupNgramSql,

    // Mirrors ConnectedComponents.run over the SAME pair set: exact
    // transitive closure (recursive CTE) then min reachable id —
    // label propagation's fixpoint, computed exactly.
    "dedup_components" ->
      s"""WITH RECURSIVE pairs AS (
         |$dedupNgramSql
         |),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a)
         |SELECT node, min(r) AS label FROM reach GROUP BY node""".stripMargin,

    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_dot_product(a.v, b.v) /
        |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4""".stripMargin,

    // Mirrors similarityLshExhaustive: all vector pairs (no label
    // blocking — the constant signature puts everything in one
    // bucket), exact cosine at the similarity_lsh threshold.
    "similarity_lsh_exhaustive" -> lshExhaustiveSql,

    // similarity_lsh emits (n_true_pairs, recall_ok): the exhaustive
    // pair count is exact SQL; the recall floor is checked on the
    // Spark side (LSH pair count is engine-specific) and asserted
    // TRUE here — a recall collapse hash-fails the gate.
    "similarity_lsh" ->
      s"""SELECT count(*) AS n_true_pairs, TRUE AS recall_ok
         |FROM ($lshExhaustiveSql)""".stripMargin,

    // similarity_ivf_kmeans emits (n_queries, recall_ok): mean recall
    // vs brute force checked Spark-side (KMeans assignment is
    // engine-specific), TRUE asserted here.
    "similarity_ivf_kmeans" ->
      """SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    // agg_approx_distinct emits the EXACT count (portable) plus the
    // Spark-side HLL bound check |est−exact| ≤ 4·rsd·exact as a
    // boolean the oracle asserts TRUE.
    "agg_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS approx_ok
        |FROM events GROUP BY 1""".stripMargin,

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
        |WHERE levenshtein(a.canon, b.canon) <= 8""".stripMargin,

    // Mirrors minhashLshPairs end to end: portable minhash bands,
    // the maxBucket=200 giant-bucket exclusion, candidate pairs on
    // band equality, exact-Jaccard verify over the hashed shingle sets.
    "dedup_minhash_lsh" ->
      s"""WITH ${minhashCtes("documents")},
         |$lshPairCtes
         |SELECT id_a, id_b, jaccard FROM lshp""".stripMargin,

    // Mirrors dedupThresholdSweep: the SAME band/candidate CTEs with
    // verify floor 0, decile-bucketed (integer div), running count at
    // or above each decile.
    "dedup_threshold_sweep" ->
      s"""WITH ${minhashCtes("documents")},
         |ok AS (SELECT band_idx, band_key FROM bands
         |       GROUP BY 1, 2 HAVING count(*) <= 200),
         |b2 AS (SELECT bands.* FROM bands JOIN ok USING (band_idx, band_key)),
         |cand AS (SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
         |         FROM b2 a JOIN b2 b
         |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |          AND a.doc_id < b.doc_id),
         |allp AS (SELECT id_a, id_b,
         |           round(len(list_intersect(sa.s, sb.s)) * 10000.0 /
         |                 (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))) / 10000 AS jaccard
         |         FROM cand JOIN sh sa ON sa.doc_id = id_a
         |                   JOIN sh sb ON sb.doc_id = id_b),
         |hist AS (SELECT CAST(round(jaccard * 10000) AS BIGINT) // 1000 AS bucket,
         |                count(*) AS n_pairs
         |         FROM allp GROUP BY 1)
         |SELECT bucket, n_pairs,
         |       CAST(sum(n_pairs) OVER (ORDER BY bucket DESC
         |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
         |         AS n_at_or_above
         |FROM hist""".stripMargin,

    // Mirrors SemDedup.semanticDedup end to end with the TWO-LEVEL
    // deterministic quantizer: min-md5 centers (16), the ⌈√16⌉ = 4
    // smallest-md5 of those as super-centers, each center argmax-
    // assigned to a super (ties prefer itself, then min id), each
    // vector argmax-assigned to a super then to the best center IN
    // THAT SUPER'S BUCKET ONLY — all cosines in the rounded 4-dp
    // integer space. Then within-cluster pairs at cosine ≥ 0.4, exact
    // transitive closure (recursive CTE — the dedup_components
    // pattern) for the duplicate groups, keep min id.
    "dedup_semantic" ->
      """WITH RECURSIVE e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS center_id, v AS cv FROM e
        |      ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        |sup AS (SELECT center_id AS super_id, cv AS sv FROM c
        |        ORDER BY md5(center_id::VARCHAR), center_id LIMIT 4),
        |cs AS (SELECT super_id, center_id, cv FROM (
        |    SELECT c.center_id, c.cv, sup.super_id,
        |      row_number() OVER (PARTITION BY c.center_id ORDER BY
        |        round(list_dot_product(c.cv, sup.sv) /
        |          (sqrt(list_dot_product(c.cv, c.cv)) * sqrt(list_dot_product(sup.sv, sup.sv))) * 10000) DESC,
        |        (sup.super_id <> c.center_id), sup.super_id) AS rk
        |    FROM c CROSS JOIN sup) WHERE rk = 1),
        |vsup AS (SELECT vec_id, v, super_id FROM (
        |    SELECT e.vec_id, e.v, sup.super_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_dot_product(e.v, sup.sv) /
        |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(sup.sv, sup.sv))) * 10000) DESC,
        |        sup.super_id) AS rk
        |    FROM e CROSS JOIN sup) WHERE rk = 1),
        |assign AS (SELECT vec_id, v, center_id AS cluster FROM (
        |    SELECT vs.vec_id, vs.v, cs.center_id,
        |      row_number() OVER (PARTITION BY vs.vec_id ORDER BY
        |        round(list_dot_product(vs.v, cs.cv) /
        |          (sqrt(list_dot_product(vs.v, vs.v)) * sqrt(list_dot_product(cs.cv, cs.cv))) * 10000) DESC,
        |        cs.center_id) AS rk
        |    FROM vsup vs JOIN cs USING (super_id)) WHERE rk = 1),
        |pairs AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b FROM assign a
        |  JOIN assign b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        |  WHERE round(list_dot_product(a.v, b.v) /
        |          (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 >= 0.4),
        |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
        |          UNION SELECT id_b, id_a FROM pairs),
        |reach AS (
        |  SELECT a AS node, a AS r FROM edges
        |  UNION
        |  SELECT reach.node, e2.b FROM reach JOIN edges e2 ON reach.r = e2.a),
        |labels AS (SELECT node, min(r) AS lbl FROM reach GROUP BY node)
        |SELECT a.vec_id, a.cluster,
        |       coalesce(l.lbl, a.vec_id) AS dup_label,
        |       coalesce(l.lbl, a.vec_id) = a.vec_id AS is_keep
        |FROM assign a LEFT JOIN labels l ON l.node = a.vec_id""".stripMargin,

    // Mirrors splitLeakage: the dedup_minhash_lsh pair screen joined
    // to the split_assign md5 buckets, keeping cross-split pairs.
    "split_leakage" ->
      s"""WITH ${minhashCtes("documents")},
         |$lshPairCtes,
         |sp AS (SELECT doc_id,
         |         CASE WHEN bucket < 80 THEN 'train'
         |              WHEN bucket < 90 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM (
         |         SELECT doc_id,
         |                CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
         |                     % 100 AS INTEGER) AS bucket
         |         FROM documents))
         |SELECT id_a, id_b, sa.split AS split_a, sb.split AS split_b, jaccard
         |FROM lshp JOIN sp sa ON sa.doc_id = id_a
         |          JOIN sp sb ON sb.doc_id = id_b
         |WHERE sa.split <> sb.split""".stripMargin,

    // Mirrors Splits.repairLeakage over the production pair graph:
    // min-label connected components (the dedup_components recursive
    // CTE) over the LSH pairs, components spanning >1 split move
    // whole to train. Shares the minhash/band/split CTEs with
    // split_leakage.
    "split_repair" ->
      s"""WITH RECURSIVE ${minhashCtes("documents")},
         |$lshPairCtes,
         |sp AS (SELECT doc_id,
         |         CASE WHEN bucket < 80 THEN 'train'
         |              WHEN bucket < 90 THEN 'val'
         |              ELSE 'test' END AS split
         |       FROM (
         |         SELECT doc_id,
         |                CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
         |                     % 100 AS INTEGER) AS bucket
         |         FROM documents)),
         |edges AS (SELECT id_a AS a, id_b AS b FROM lshp
         |          UNION SELECT id_b, id_a FROM lshp),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
         |span AS (SELECT label FROM comp JOIN sp ON sp.doc_id = comp.node
         |         GROUP BY label HAVING count(DISTINCT sp.split) > 1)
         |SELECT d.doc_id, sp.split,
         |       s.label IS NOT NULL AND sp.split <> 'train' AS moved,
         |       CASE WHEN s.label IS NOT NULL AND sp.split <> 'train'
         |            THEN 'train' ELSE sp.split END AS split_repaired
         |FROM documents d
         |JOIN sp USING (doc_id)
         |LEFT JOIN comp c ON c.node = d.doc_id
         |LEFT JOIN span s ON s.label = c.label""".stripMargin,

    // Mirrors minhashClusters: same bands, three label-propagation
    // rounds, singletons as their own clusters.
    "dedup_minhash_clusters" ->
      s"""WITH ${minhashCtes("documents")},
         |${minhashClusterCtes("documents")}
         |SELECT doc_id AS doc, lbl AS cluster FROM l3
         |UNION ALL
         |SELECT doc_id, doc_id FROM singletons""".stripMargin,

    // Mirrors simhashPairs OUTPUT (combination banding has recall
    // exactly 1.0 by pigeonhole and the exact-Hamming verify removes
    // false candidates, so the result ≡ the all-pairs filter — which
    // is what the oracle can afford at verify scale): per-token
    // md5-lower-64 bit votes, sign bits packed into a signed 64-bit
    // value, pairs at Hamming ≤ 3.
    "dedup_simhash" ->
      s"""WITH t AS (
        |  SELECT doc_id, unnest(${wsToks("text")}) AS tok FROM documents),
        |th AS (SELECT doc_id, md5_number_lower(tok) AS h FROM t),
        |votes AS (SELECT doc_id, b,
        |            sum(CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END) AS v
        |          FROM th CROSS JOIN generate_series(0, 63) g(b)
        |          GROUP BY doc_id, b),
        |sh0 AS (SELECT doc_id,
        |         sum(CASE WHEN v > 0 THEN
        |               CASE WHEN b = 63 THEN -9223372036854775807 - 1
        |                    ELSE (1::BIGINT << b) END
        |             ELSE 0 END)::BIGINT AS sh
        |       FROM votes GROUP BY doc_id),
        |-- token-less docs (empty/whitespace-only text) hash to 0 on the
        |-- Spark side (no votes, no set bits); keep the relation total
        |sh AS (SELECT d.doc_id, coalesce(s.sh, 0) AS sh
        |       FROM documents d LEFT JOIN sh0 s USING (doc_id))
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.sh, b.sh))::INTEGER AS hamming
        |FROM sh a JOIN sh b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.sh, b.sh)) <= 3""".stripMargin,

    // Mirrors MultiModal.audioRoundTrip: the WAV synthesis chooses
    // rate/frames/samples as pure functions of doc_id and PCM WAV is
    // lossless, so a CORRECT javax.sound.sampled decode must hand
    // exactly these back — format fields arithmetically, sample stats
    // via the sawtooth formula summed over generate_series.
    "mm_audio_meta" ->
      """WITH p AS (
        |  SELECT doc_id,
        |         CAST(8000 + (doc_id % 5) * 2000 AS BIGINT) AS rate,
        |         CAST(400 + (doc_id % 7) * 100 AS BIGINT) AS frames,
        |         (doc_id % 11) + 3 AS k
        |  FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(sum(((i * k) % 2048) - 1024) AS BIGINT) AS sum_samples
        |      FROM (SELECT doc_id, k,
        |              unnest(generate_series(0, frames - 1)) AS i FROM p)
        |      GROUP BY doc_id)
        |SELECT p.doc_id,
        |       CAST(rate AS INTEGER) AS sample_rate,
        |       CAST(1 AS INTEGER) AS channels,
        |       CAST(16 AS INTEGER) AS bits,
        |       frames AS n_frames,
        |       CAST(frames * 1000 // rate AS BIGINT) AS duration_ms,
        |       CAST(-1024 AS INTEGER) AS first_sample,
        |       CAST((((frames - 1) * k) % 2048) - 1024 AS INTEGER) AS last_sample,
        |       sum_samples
        |FROM p JOIN s USING (doc_id)""".stripMargin,

    // Mirrors dedupImagePhash: the scene fixture's pixels are pure
    // integer functions of doc_id and PNG is lossless, so a CORRECT
    // javax.imageio decode + 9x8 dHash must reproduce exactly this
    // arithmetic; combination banding has recall 1.0 at Hamming <= 3
    // and the exact verify kills false candidates, so the operator
    // output == the all-pairs Hamming filter (same argument as
    // dedup_simhash). Bit 63 wraps to the signed BIGINT min like the
    // simhash oracle does.
    "dedup_image_phash" ->
      """WITH lcg AS (
        |  SELECT doc_id, x, y,
        |         (((doc_id // 8) * 72 + y * 9 + x) * 1103515245 + 12345)
        |           % 2147483648 AS h1
        |  FROM documents
        |  CROSS JOIN generate_series(0, 8) gx(x)
        |  CROSS JOIN generate_series(0, 7) gy(y)),
        |lcg2 AS (SELECT doc_id, x, y,
        |           (h1 * 1103515245 + 12345) % 2147483648 AS h2 FROM lcg),
        |px AS (
        |  SELECT doc_id, x, y,
        |         (xor(h2 >> 16,
        |              ((h2 * 1103515245 + 12345) % 2147483648) >> 8) % 200
        |          + (doc_id % 8) * 3
        |          + CASE WHEN doc_id % 5 = 0 AND x = doc_id % 9
        |                      AND y = (doc_id * 3) % 8
        |                 THEN 30 ELSE 0 END) AS g
        |  FROM lcg2),
        |bits AS (
        |  SELECT a.doc_id, a.x, a.y,
        |         CASE WHEN b.g > a.g THEN 1 ELSE 0 END AS bit
        |  FROM px a JOIN px b ON b.doc_id = a.doc_id AND b.y = a.y
        |                     AND b.x = a.x + 1
        |  WHERE a.x < 8),
        |ph AS (SELECT doc_id,
        |         sum(CASE WHEN bit = 1 THEN
        |               CASE WHEN y * 8 + x = 63 THEN -9223372036854775807 - 1
        |                    ELSE (1::BIGINT << (y * 8 + x)) END
        |             ELSE 0 END)::BIGINT AS ph
        |       FROM bits GROUP BY doc_id)
        |SELECT a.doc_id AS id_a, b.doc_id AS id_b,
        |       bit_count(xor(a.ph, b.ph))::INTEGER AS hamming
        |FROM ph a JOIN ph b ON a.doc_id < b.doc_id
        |WHERE bit_count(xor(a.ph, b.ph)) <= 3""".stripMargin,

    // Mirrors winnowingContainmentPairs (k=16, w=8): polynomial
    // fingerprint sets, the maxDocFreq=50 hot-fingerprint cap,
    // containment over retained counts.
    "dedup_winnowing" ->
      s"""WITH ${winnowCtes(16, 8)},
         |ex_all AS (SELECT doc_id, unnest(fps) AS f FROM m),
         |hot AS (SELECT f FROM ex_all GROUP BY 1 HAVING count(*) > 50),
         |ex AS (SELECT * FROM ex_all
         |       WHERE NOT EXISTS (SELECT 1 FROM hot h WHERE h.f = ex_all.f)),
         |sz AS (SELECT doc_id, count(*) AS n_fp FROM ex GROUP BY 1),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_shared
         |  FROM ex a JOIN ex b ON a.f = b.f AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2)
         |SELECT id_a, id_b, n_shared,
         |       round(CAST(n_shared * 10000 AS DOUBLE) / least(sa.n_fp, sb.n_fp)) / 10000 AS containment
         |FROM shared JOIN sz sa ON sa.doc_id = id_a JOIN sz sb ON sb.doc_id = id_b
         |WHERE round(CAST(n_shared * 10000 AS DOUBLE) / least(sa.n_fp, sb.n_fp)) / 10000 >= 0.3""".stripMargin,

    // Mirrors textFingerprint: winnow(k=8, w=4) summary stats.
    "text_fingerprint" ->
      s"""WITH ${winnowCtes(8, 4)}
         |SELECT doc_id, len(fps)::INTEGER AS n_fingerprints,
         |       list_min(fps) AS min_fp, list_max(fps) AS max_fp
         |FROM m""".stripMargin,

    // Mirrors Decontam.overlapStats: distinct 5-gram shingles of each
    // training doc probed against the benchmark's distinct shingle set
    // (benchmark = every 20th doc), counts per contaminated doc.
    "decontam_overlap" -> decontamOverlapSql,

    // decontam_bloom is the SAME relation through the bloom-prefilter
    // plan (Decontam.overlapStatsBloom): the bitset admits no false
    // negatives and the exact-confirm join kills false positives, so
    // the exact-SQL twin is identical by construction.
    "decontam_bloom" -> decontamOverlapSql,

    // Mirrors Splits.assign bit-for-bit: top 60 bits of
    // md5(doc_id || 'graft') mod 100 → 80/10/10 ranges.
    "split_assign" ->
      """SELECT doc_id, bucket,
        |       CASE WHEN bucket < 80 THEN 'train'
        |            WHEN bucket < 90 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (
        |  SELECT doc_id,
        |         CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
        |              % 100 AS INTEGER) AS bucket
        |  FROM documents)""".stripMargin,

    "agg_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_distinct
        |FROM events GROUP BY 1""".stripMargin,

    "similarity_topk" -> similarityTopkSql,

    "similarity_ivf" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |scored AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         round(list_dot_product(q.v, c.v) /
        |               (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) * 10000) / 10000 AS cosine
        |  FROM e c JOIN q ON c.label = q.label WHERE q.vec_id <> c.vec_id)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 5""".stripMargin,

    // Exhaustive-probe IVF ≡ brute force by construction, so the
    // oracle IS the similarity_topk query: cosine over all candidate
    // pairs, top-10 per query with the id tiebreak. k-means centroids
    // never appear in the result — every cluster is probed.
    // similarity_ivf_exhaustive probes every cluster, so its relation
    // IS brute-force top-k — same twin as similarity_topk.
    "similarity_ivf_exhaustive" -> similarityTopkSql,

    // Mirrors Similarity.topKQuantizedRerank end to end: the same
    // floor(x·scale+0.5) quantization as embedding_quantize (kept as
    // integer-valued DOUBLE lists — exact), candidate score = ratio of
    // integer dot products (every partial < 2^53 ⇒ exact, order-free),
    // top-20 candidates then exact-cosine top-5, both rankings with
    // the neighbor-id tiebreak. Zero-norm vectors take the -2.0
    // sentinel in both engines.
    "similarity_quantized" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
        |             THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
        |             ELSE 0.0 END AS sc
        |      FROM e),
        |qz AS (SELECT vec_id, v,
        |         list_transform(v, x -> floor(x * sc + 0.5)) AS qv
        |       FROM s),
        |q AS (SELECT vec_id, v, qv FROM qz WHERE vec_id < 5),
        |cand AS (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         c.v AS cv, q.v AS qvec,
        |         CASE WHEN list_dot_product(c.qv, c.qv) > 0
        |                AND list_dot_product(q.qv, q.qv) > 0
        |              THEN list_dot_product(c.qv, q.qv) /
        |                   (sqrt(list_dot_product(c.qv, c.qv)) *
        |                    sqrt(list_dot_product(q.qv, q.qv)))
        |              ELSE -2.0 END AS cos_q
        |  FROM qz c CROSS JOIN q WHERE c.vec_id <> q.vec_id),
        |top AS (
        |  SELECT query_id, neighbor_id, cv, qvec FROM (
        |    SELECT *, row_number() OVER (
        |      PARTITION BY query_id ORDER BY cos_q DESC, neighbor_id ASC) AS crk
        |    FROM cand)
        |  WHERE crk <= 20),
        |rescored AS (
        |  SELECT query_id, neighbor_id,
        |         round(list_dot_product(qvec, cv) /
        |               (sqrt(list_dot_product(qvec, qvec)) * sqrt(list_dot_product(cv, cv))) * 10000) / 10000 AS cosine
        |  FROM top)
        |SELECT query_id, neighbor_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY query_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM rescored)
        |WHERE rank <= 5""".stripMargin,

    // Mirrors VectorQuant bit-for-bit: float→double widening, exact
    // IEEE 127/max|x| scale, explicit floor(x·scale + 0.5) rounding.
    // Scalar rows (vec_id, pos, q_i, scale): unnest + generate_subscripts
    // zip row-wise, matching the Spark side's posexplode.
    "embedding_quantize" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        CASE WHEN list_max(list_transform(v, x -> abs(x))) > 0
        |             THEN 127.0 / list_max(list_transform(v, x -> abs(x)))
        |             ELSE 0.0 END AS scale
        |      FROM e),
        |q AS (SELECT vec_id, scale,
        |        list_transform(v, x -> CAST(floor(x * scale + 0.5) AS TINYINT)) AS qv
        |      FROM s)
        |SELECT vec_id,
        |       CAST(generate_subscripts(qv, 1) - 1 AS INTEGER) AS pos,
        |       unnest(qv) AS q_i,
        |       scale
        |FROM q""".stripMargin,

    // Mirrors VectorStats.vectorStats: same widened-float dot product
    // (sequential, bit-identical), micro-scaled exact component mean.
    "embedding_stats" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT vec_id,
        |       CAST(len(v) AS INTEGER) AS dim,
        |       round(sqrt(list_dot_product(v, v)) * 10000) / 10000 AS l2_norm,
        |       list_max(list_transform(v, x -> abs(x))) AS max_abs,
        |       CAST(list_sum(list_transform(v,
        |              x -> CAST(round(x * 1000000) AS BIGINT))) AS DOUBLE)
        |         / CAST(len(v) AS INTEGER) / 1000000 AS mean_c
        |FROM e""".stripMargin,

    // Mirrors VectorStats.componentCentroids: unnest+subscripts zip,
    // order-independent integer sums.
    "embedding_centroids" ->
      """WITH x AS (
        |  SELECT label,
        |         CAST(generate_subscripts(v, 1) - 1 AS INTEGER) AS pos,
        |         unnest(v) AS c
        |  FROM (SELECT label, embedding::DOUBLE[] AS v FROM embeddings))
        |SELECT label, pos,
        |       CAST(sum(CAST(round(c * 1000000) AS BIGINT)) AS DOUBLE)
        |         / count(*) / 1000000 AS centroid
        |FROM x GROUP BY 1, 2""".stripMargin,

    // text_quality's score chain + lang, binned with ntile (both
    // engines give remainder rows to the first buckets).
    "quality_ntile" ->
      s"""WITH w AS (SELECT doc_id, lang, ${wsToks("text")} AS toks FROM documents),
        |sig AS (
        |  SELECT doc_id, lang,
        |         CAST(len(toks) AS INTEGER) AS n_tokens,
        |         CAST(len(list_filter(toks,
        |           t -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t))) AS INTEGER) AS n_stopwords,
        |         CAST(${tokCharSum("toks")} AS BIGINT) AS sum_tok_chars
        |  FROM w),
        |r AS (
        |  SELECT doc_id, lang,
        |         round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) / 10000 AS stop_ratio,
        |         round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) / 10000 AS mean_token_len
        |  FROM sig),
        |q AS (
        |  SELECT *, least(300000, greatest(0,
        |           50 * CAST(round(stop_ratio * 10000) AS BIGINT) + 150000
        |           - 3 * abs(CAST(round(mean_token_len * 10000) AS BIGINT) - 50000))) AS q30
        |  FROM r),
        |sc AS (
        |  SELECT doc_id, lang, CAST((q30 + 15) // 30 AS DOUBLE) / 10000 AS quality_score
        |  FROM q)
        |SELECT doc_id, lang, quality_score,
        |       CAST(ntile(10) OVER (PARTITION BY lang
        |         ORDER BY quality_score ASC, doc_id ASC) AS INTEGER) AS decile
        |FROM sc""".stripMargin,

    "text_stats" ->
      s"""SELECT source, count(*) AS n_docs,
        |       CAST(sum(len(${wsToks("text")})) AS BIGINT) AS total_tokens,
        |       round(CAST(sum(len(${wsToks("text")})) * 10000 AS DOUBLE)
        |             / count(*)) / 10000 AS avg_tokens,
        |       max(n_chars) AS max_chars
        |FROM documents GROUP BY 1""".stripMargin,

    // quality_score mirrors TextOps.qualityScore's integer-exact HALF_UP
    // ((q30+15)//30): engine round(double,4) diverges on .xxxx5 scores.
    "text_quality" ->
      s"""WITH w AS (SELECT doc_id, text, ${wsToks("text")} AS toks FROM documents),
        |sig AS (
        |  SELECT doc_id,
        |         CAST(len(toks) AS INTEGER) AS n_tokens,
        |         CAST(len(list_filter(toks,
        |           t -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t))) AS INTEGER) AS n_stopwords,
        |         CAST(${tokCharSum("toks")} AS BIGINT) AS sum_tok_chars,
        |         length(text) AS n_chars_raw,
        |         length(regexp_replace(text, '[[:punct:]]', '', 'g')) AS n_nopunct
        |  FROM w),
        |r AS (
        |  SELECT doc_id, n_tokens, n_stopwords,
        |         round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) / 10000 AS stop_ratio,
        |         round(CAST((n_chars_raw - n_nopunct) * 10000 AS DOUBLE) / n_chars_raw) / 10000 AS punct_ratio,
        |         round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) / 10000 AS mean_token_len
        |  FROM sig),
        |q AS (
        |  SELECT *, least(300000, greatest(0,
        |           50 * CAST(round(stop_ratio * 10000) AS BIGINT) + 150000
        |           - 3 * abs(CAST(round(mean_token_len * 10000) AS BIGINT) - 50000))) AS q30
        |  FROM r)
        |SELECT doc_id, n_tokens, n_stopwords, stop_ratio, punct_ratio, mean_token_len,
        |       CAST((q30 + 15) // 30 AS DOUBLE) / 10000 AS quality_score
        |FROM q""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |                     x -> len(x) > 0) AS toks
        |  FROM documents),
        |s AS (
        |  SELECT doc_id,
        |    len(list_filter(toks, x -> list_contains(['der','die','das','und','ist','nicht','ein','mit'], x))) AS s_de,
        |    len(list_filter(toks, x -> list_contains(['the','and','of','is','to','in','that','it'], x))) AS s_en,
        |    len(list_filter(toks, x -> list_contains(['el','la','los','las','y','es','que','una'], x))) AS s_es,
        |    len(list_filter(toks, x -> list_contains(['le','la','les','et','est','que','une','dans'], x))) AS s_fr,
        |    len(list_filter(toks, x -> list_contains(['il','la','che','e','di','un','per','non'], x))) AS s_it
        |  FROM t)
        |SELECT doc_id,
        |       CASE WHEN greatest(s_de, s_en, s_es, s_fr, s_it) <= 0 THEN 'und'
        |            WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_it) THEN 'de'
        |            WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_it) THEN 'en'
        |            WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_it) THEN 'es'
        |            WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_it) THEN 'fr'
        |            ELSE 'it' END AS lang_pred
        |FROM s""".stripMargin,

    // Mirrors TextOps.repetitionSignals: total trigram occurrences vs
    // distinct trigrams per doc.
    "text_repetition" ->
      s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
        |d AS (SELECT doc_id,
        |        CAST(len(toks) - 2 AS BIGINT) AS n_ngrams,
        |        CAST(len(list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                                for i in generate_series(1, len(toks) - 2)])) AS BIGINT) AS n_distinct
        |      FROM w WHERE len(toks) >= 3)
        |SELECT doc_id, n_ngrams, n_distinct,
        |       round(CAST((n_ngrams - n_distinct) * 10000 AS DOUBLE) / n_ngrams) / 10000 AS repetition
        |FROM d""".stripMargin,

    // Mirrors TextOps.boilerplateSignals: distinct trigrams per doc,
    // gram document frequency = count(*) over the per-doc-distinct
    // explode, boilerplate ⟺ df >= 5, keep gate in exact integer
    // space (100·n_boiler <= 60·n_grams). Spark grams are 61-bit
    // portable hashes, the oracle's are the strings themselves —
    // identical df statistics (the dedup_ngram precedent).
    "text_boilerplate" ->
      s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) AS s
        |       FROM w WHERE len(toks) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |gdf AS (SELECT g, count(*) AS df FROM ex GROUP BY 1),
        |per AS (SELECT doc_id, count(*) AS n_grams,
        |          CAST(sum(CASE WHEN df >= 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
        |        FROM ex JOIN gdf USING (g) GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |       CAST(coalesce(n_boiler, 0) AS BIGINT) AS n_boiler,
        |       CASE WHEN n_grams > 0
        |         THEN round(CAST(n_boiler * 10000 AS DOUBLE) / n_grams) / 10000
        |       END AS boiler_ratio,
        |       coalesce(100 * n_boiler <= 60 * n_grams, TRUE) AS keep
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors TextOps.topGramShare: bigram occurrence counts per doc,
    // the top gram by the count-desc/gram-asc tiebreak, occurrence
    // share at 4 dp, keep gate in exact integer space.
    "text_topgram" ->
      s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
        |ex AS (SELECT doc_id,
        |         unnest([toks[i] || ' ' || toks[i+1]
        |                 for i in generate_series(1, len(toks) - 1)]) AS g
        |       FROM w WHERE len(toks) >= 2),
        |counts AS (SELECT doc_id, g, count(*) AS cnt FROM ex GROUP BY 1, 2),
        |ranked AS (SELECT doc_id, g, cnt,
        |             row_number() OVER (PARTITION BY doc_id
        |                                ORDER BY cnt DESC, g ASC) AS rn
        |           FROM counts),
        |per AS (SELECT doc_id, CAST(sum(cnt) AS BIGINT) AS n_grams
        |        FROM counts GROUP BY 1),
        |top AS (SELECT doc_id, g AS top_gram, cnt AS top_count
        |        FROM ranked WHERE rn = 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_grams, 0) AS BIGINT) AS n_grams,
        |       top_gram,
        |       CAST(coalesce(top_count, 0) AS BIGINT) AS top_count,
        |       CASE WHEN n_grams > 0
        |         THEN round(CAST(top_count * 10000 AS DOUBLE) / n_grams) / 10000
        |       END AS top_share,
        |       coalesce(100 * top_count <= 20 * n_grams, TRUE) AS keep
        |FROM documents d LEFT JOIN per USING (doc_id) LEFT JOIN top USING (doc_id)""".stripMargin,

    // Mirrors Dedup.newAgainstReference over the odd/even batch split:
    // canonical fingerprint anti-join (same canon form as dedup_exact).
    "dedup_incremental" ->
      """SELECT doc_id, text FROM documents d
        |WHERE doc_id % 2 <> 0
        |  AND NOT EXISTS (
        |    SELECT 1 FROM documents r
        |    WHERE r.doc_id % 2 = 0
        |      AND md5(regexp_replace(lower(trim(r.text)), '\s+', ' ', 'g')) =
        |          md5(regexp_replace(lower(trim(d.text)), '\s+', ' ', 'g')))""".stripMargin,

    // Mirrors Dedup.newAgainstReferenceNear over the odd/even split:
    // the SAME portable band CTEs as dedup_minhash_lsh (bands over all
    // documents ≡ the union of both sides' band frames, since banding
    // is per-doc), combined-occupancy maxBucket=200 cap, cross-side
    // candidates, exact-Jaccard verify, anti-join of verified dups.
    "dedup_incremental_near" ->
      s"""WITH ${minhashCtes("documents")},
         |ok AS (SELECT band_idx, band_key FROM bands
         |       GROUP BY 1, 2 HAVING count(*) <= 200),
         |b2 AS (SELECT bands.* FROM bands JOIN ok USING (band_idx, band_key)),
         |cand AS (SELECT DISTINCT a.doc_id AS in_doc, b.doc_id AS ref_doc
         |         FROM b2 a JOIN b2 b
         |           ON a.band_idx = b.band_idx AND a.band_key = b.band_key
         |         WHERE a.doc_id % 2 <> 0 AND b.doc_id % 2 = 0),
         |dup AS (SELECT DISTINCT in_doc FROM (
         |  SELECT in_doc,
         |         round(len(list_intersect(sa.s, sb.s)) * 10000.0 /
         |               (len(sa.s) + len(sb.s) - len(list_intersect(sa.s, sb.s)))) / 10000 AS jaccard
         |  FROM cand JOIN sh sa ON sa.doc_id = in_doc
         |            JOIN sh sb ON sb.doc_id = ref_doc)
         |  WHERE jaccard >= 0.5)
         |SELECT doc_id, text FROM documents d
         |WHERE doc_id % 2 <> 0
         |  AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.in_doc = d.doc_id)""".stripMargin,

    // Mirrors Packing.packByBudget: per-source running token totals,
    // pack = floor(preceding_total / 512).
    "pack_budget" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t)
        |SELECT doc_id, source, n_tokens,
        |       CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
        |FROM c""".stripMargin,

    // Mirrors Packing.packTexts over packByBudget: per-pack ordered
    // concatenation, verified through md5 of the assembled text.
    "pack_concat" ->
      """WITH t AS (
        |  SELECT doc_id, source, text,
        |         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        |p AS (
        |  SELECT doc_id, source, text,
        |         CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id
        |  FROM c)
        |SELECT source, pack_id, count(*) AS n_docs,
        |       md5(string_agg(text, chr(10) || chr(10) ORDER BY doc_id)) AS pack_md5
        |FROM p GROUP BY 1, 2""".stripMargin,

    // Mirrors packStats over the pack_budget CTE: per-pack totals,
    // then per-source fill efficiency vs the 512 budget.
    "pack_stats" ->
      """WITH t AS (
        |  SELECT doc_id, source,
        |         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS BIGINT) AS n_tokens
        |  FROM documents),
        |c AS (
        |  SELECT *, sum(n_tokens) OVER (
        |    PARTITION BY source ORDER BY doc_id
        |    ROWS UNBOUNDED PRECEDING) AS cum
        |  FROM t),
        |p AS (
        |  SELECT source, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
        |         n_tokens
        |  FROM c),
        |packs AS (
        |  SELECT source, pack_id, count(*) AS n_docs,
        |         CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
        |  FROM p GROUP BY 1, 2)
        |SELECT source, count(*) AS n_packs,
        |       CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
        |       round(sum(pack_tokens) * 10000.0 / (count(*) * 512)) / 10000
        |         AS mean_fill,
        |       max(pack_tokens) AS max_pack_tokens
        |FROM packs GROUP BY 1""".stripMargin,

    // Mirrors TextOps.vocabTopK (regex tokens, lowercased): wordcount
    // top-100 with the token-string tiebreak making the set exact.
    "vocab_topk" ->
      """SELECT token, count(*) AS n
        |FROM (
        |  SELECT unnest(list_filter(
        |           regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |           x -> len(x) > 0)) AS token
        |  FROM documents)
        |GROUP BY 1
        |ORDER BY n DESC, token ASC
        |LIMIT 100""".stripMargin,

    // Mirrors TextOps.vocabOverlap: distinct (source, token), token-
    // keyed self-join, Jaccard with integer-scaled rounding.
    "source_overlap" ->
      """WITH gt AS (
        |  SELECT DISTINCT source AS g, token FROM (
        |    SELECT source,
        |           unnest(list_filter(
        |             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |             x -> len(x) > 0)) AS token
        |    FROM documents)),
        |sz AS (SELECT g, count(*) AS n_vocab FROM gt GROUP BY 1),
        |ov AS (
        |  SELECT a.g AS g_a, b.g AS g_b, count(*) AS n_shared
        |  FROM gt a JOIN gt b ON a.token = b.token AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT g_a, g_b, n_shared, sa.n_vocab AS n_a, sb.n_vocab AS n_b,
        |       round(n_shared * 10000.0 / (sa.n_vocab + sb.n_vocab - n_shared))
        |         / 10000 AS jaccard
        |FROM ov
        |JOIN sz sa ON sa.g = g_a
        |JOIN sz sb ON sb.g = g_b""".stripMargin,

    // Mirrors TextOps.tfidfTopK (logIdf=false): same tokenizer as
    // vocab_topk, exact rational idf (N+1)/(df+1), integer-scaled
    // rounding, (score desc, token) tiebreak.
    "text_tfidf" ->
      """WITH tf AS (
        |  SELECT doc, token, count(*) AS tf FROM (
        |    SELECT doc_id AS doc,
        |           unnest(list_filter(
        |             regexp_split_to_array(lower(text), '[^a-z0-9]+'),
        |             x -> len(x) > 0)) AS token
        |    FROM documents)
        |  GROUP BY 1, 2),
        |dfreq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
        |n AS (SELECT count(DISTINCT doc_id) AS n_docs FROM documents),
        |s AS (
        |  SELECT doc, token, tf, df,
        |         round(tf * (n_docs + 1) * 10000.0 / (df + 1)) / 10000 AS score
        |  FROM tf JOIN dfreq USING (token) CROSS JOIN n)
        |SELECT doc, token, tf, df, score, rank FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY doc ORDER BY score DESC, token ASC) AS INTEGER) AS rank
        |  FROM s)
        |WHERE rank <= 3""".stripMargin,

    // Mirrors TextOps.redactPii/piiCount: email → IP → long-digit-run
    // replacement chain, each pattern counted on the text state it is
    // applied to; md5 verifies the full scrubbed payload.
    "text_redact" ->
      """WITH s0 AS (SELECT doc_id, text AS t0 FROM documents),
        |s1 AS (SELECT doc_id, t0,
        |         regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1
        |       FROM s0),
        |s2 AS (SELECT *, regexp_replace(t1, '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS t2 FROM s1),
        |s3 AS (SELECT *, regexp_replace(t2, '\d{7,}', '<NUM>', 'g') AS t3 FROM s2)
        |SELECT doc_id,
        |       CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
        |          + len(regexp_extract_all(t1, '\b\d{1,3}(\.\d{1,3}){3}\b'))
        |          + len(regexp_extract_all(t2, '\d{7,}')) AS INTEGER) AS n_pii,
        |       md5(t3) AS redacted_md5
        |FROM s3""".stripMargin,

    // Mirrors curateCorpus end to end: quality gate (same rounded
    // signal algebra as text_quality) → min-doc-id keep per canonical
    // md5 → drop docs sharing any 5-gram with the benchmark set →
    // md5-bucket split.
    "curate_corpus" ->
      """WITH sig AS (
        |  SELECT doc_id, text,
        |         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS INTEGER) AS n_tokens,
        |         CAST(len(list_filter(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> ''),
        |           t -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t))) AS INTEGER) AS n_stopwords,
        |         CAST(coalesce(list_sum(list_transform(
        |           list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> ''),
        |           t -> length(t))), 0) AS BIGINT) AS sum_tok_chars
        |  FROM documents WHERE doc_id % 20 <> 0),
        |q AS (
        |  SELECT doc_id, text,
        |         CAST((least(300000, greatest(0,
        |             50 * CAST(round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) AS BIGINT) + 150000
        |             - 3 * abs(CAST(round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) AS BIGINT) - 50000)))
        |           + 15) // 30 AS DOUBLE) / 10000 AS quality_score
        |  FROM sig),
        |kept AS (SELECT * FROM q WHERE quality_score >= 0.5),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |deduped AS (
        |  SELECT k.* FROM kept k
        |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
        |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                          || ' ' || toks[i+3] || ' ' || toks[i+4]
        |                        for i in generate_series(1, len(toks) - 4)]) AS s
        |       FROM w WHERE len(toks) >= 5),
        |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 20 = 0),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 20 <> 0) t
        |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.shingle = t.shingle)),
        |cleaned AS (
        |  SELECT * FROM deduped d
        |  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id))
        |SELECT doc_id, quality_score,
        |       CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
        |FROM (
        |  SELECT doc_id, quality_score,
        |         CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
        |              % 100 AS INTEGER) AS bucket
        |  FROM cleaned)""".stripMargin,

    // Mirrors curateCorpusNear: same four stages as curate_corpus but
    // the keep-set is the minhash-cluster representatives (doc ==
    // cluster) over the quality-kept subset — the minhash CTEs run on
    // `kept`, and singleton docs (no shingles) represent themselves.
    "curate_corpus_near" ->
      raw"""WITH sig0 AS (
         |  SELECT doc_id, text,
         |         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS INTEGER) AS n_tokens,
         |         CAST(len(list_filter(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> ''),
         |           t -> list_contains(['the','a','an','of','and','or','to','in','is','it'], t))) AS INTEGER) AS n_stopwords,
         |         CAST(coalesce(list_sum(list_transform(
         |           list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> ''),
         |           t -> length(t))), 0) AS BIGINT) AS sum_tok_chars
         |  FROM documents WHERE doc_id % 20 <> 0),
         |q AS (
         |  SELECT doc_id, text,
         |         CAST((least(300000, greatest(0,
         |             50 * CAST(round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) AS BIGINT) + 150000
         |             - 3 * abs(CAST(round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) AS BIGINT) - 50000)))
         |           + 15) // 30 AS DOUBLE) / 10000 AS quality_score
         |  FROM sig0),
         |kept AS (SELECT * FROM q WHERE quality_score >= 0.5),
         |${minhashCtes("kept")},
         |${minhashClusterCtes("kept")},
         |keep AS (SELECT doc_id FROM l3 WHERE lbl = doc_id
         |         UNION ALL SELECT doc_id FROM singletons),
         |deduped AS (
         |  SELECT k.* FROM kept k
         |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
         |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks FROM documents),
         |sh5 AS (SELECT doc_id,
         |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                          || ' ' || toks[i+3] || ' ' || toks[i+4]
         |                        for i in generate_series(1, len(toks) - 4)]) AS s
         |       FROM w WHERE len(toks) >= 5),
         |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh5 WHERE doc_id % 20 = 0),
         |contaminated AS (
         |  SELECT DISTINCT doc_id FROM (
         |    SELECT doc_id, unnest(s) AS shingle FROM sh5 WHERE doc_id % 20 <> 0) t
         |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.shingle = t.shingle)),
         |cleaned AS (
         |  SELECT * FROM deduped d
         |  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id))
         |SELECT doc_id, quality_score,
         |       CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
         |FROM (
         |  SELECT doc_id, quality_score,
         |         CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
         |              % 100 AS INTEGER) AS bucket
         |  FROM cleaned)""".stripMargin,

    // Mirrors curateCorpusMix: boilerplate (df >= 20) ∧ gopher gates on
    // the raw corpus → minhash canonical keep over the gated subset
    // (the shared cluster CTEs run on `kept`) → per-source token
    // budget over the deduped survivors, selected rows only.
    "curate_corpus_mix" ->
      raw"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
         |sh3 AS (SELECT doc_id,
         |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                        for i in generate_series(1, len(toks) - 2)]) AS s
         |       FROM w WHERE len(toks) >= 3),
         |ex3 AS (SELECT doc_id, unnest(s) AS g3 FROM sh3),
         |gdf AS (SELECT g3, count(*) AS df FROM ex3 GROUP BY 1),
         |bper AS (SELECT doc_id, count(*) AS n_grams,
         |           CAST(sum(CASE WHEN df >= 20 THEN 1 ELSE 0 END) AS BIGINT) AS n_boiler
         |         FROM ex3 JOIN gdf USING (g3) GROUP BY 1),
         |bkeep AS (SELECT d.doc_id FROM documents d LEFT JOIN bper USING (doc_id)
         |          WHERE coalesce(100 * n_boiler <= 60 * n_grams, TRUE)),
         |gs AS (SELECT d.doc_id,
         |         CAST(len(toks) AS BIGINT) AS n_words,
         |         CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
         |           AS BIGINT) AS sum_chars,
         |         CAST(len(list_filter(toks,
         |           t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
         |         CAST(len(list_filter(toks, t -> list_contains(
         |           ['the','be','to','of','and','that','have','with'], t)))
         |           AS BIGINT) AS n_stop,
         |         CAST(len(regexp_extract_all(d.text, '#|\.\.\.')) AS BIGINT) AS n_sym
         |       FROM documents d JOIN w USING (doc_id)),
         |gkeep AS (SELECT doc_id FROM gs
         |          WHERE n_words >= 50 AND n_words <= 100000
         |            AND sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words
         |            AND 5 * n_alpha >= 4 * n_words
         |            AND n_stop >= 2
         |            AND 10 * n_sym <= n_words),
         |kept AS (SELECT d.doc_id, d.source, d.text FROM documents d
         |         JOIN bkeep USING (doc_id) JOIN gkeep USING (doc_id)),
         |${minhashCtes("kept")},
         |${minhashClusterCtes("kept")},
         |keep AS (SELECT doc_id FROM l3 WHERE lbl = doc_id
         |         UNION ALL SELECT doc_id FROM singletons),
         |deduped AS (
         |  SELECT k.* FROM kept k
         |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
         |t AS (SELECT d.doc_id, d.source,
         |        CAST(len(w.toks) AS BIGINT) AS n_tokens,
         |        md5(d.doc_id::VARCHAR || 'graft') AS ord
         |      FROM deduped d JOIN w USING (doc_id)),
         |c AS (SELECT doc_id, source, n_tokens,
         |        CAST(coalesce(sum(n_tokens) OVER (
         |          PARTITION BY source ORDER BY ord, doc_id
         |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |          AS BIGINT) AS cum_before
         |      FROM t)
         |SELECT doc_id, source, n_tokens, cum_before
         |FROM c
         |WHERE cum_before < CASE source WHEN 'src0' THEN 2000
         |                               WHEN 'src1' THEN 500
         |                               ELSE 1000 END""".stripMargin,

    "mm_payload_meta" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
        |       CAST(strlen(text) * 7 % 480 + 1 AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels,
        |       CAST(ascii(substr(text, 1, 1)) AS INTEGER) AS first_byte
        |FROM documents""".stripMargin,

    // Mirrors MultiModal.resizePlan: stub geometry fit into a 224-box
    // with the same exact integral arithmetic (// ≡ Spark DIV on
    // non-negatives), floored at 1.
    "mm_resize" ->
      """WITH m AS (SELECT doc_id, CAST(strlen(text) AS BIGINT) AS n_bytes,
        |             CAST(strlen(text) % 640 + 1 AS BIGINT) AS w_in,
        |             CAST(strlen(text) * 7 % 480 + 1 AS BIGINT) AS h_in
        |           FROM documents),
        |r AS (SELECT doc_id, n_bytes, w_in, h_in,
        |        greatest(1, (w_in * 224) // greatest(w_in, h_in)) AS w_out,
        |        greatest(1, (h_in * 224) // greatest(w_in, h_in)) AS h_out
        |      FROM m)
        |SELECT doc_id, n_bytes, w_in, h_in, w_out, h_out,
        |       greatest(1, (n_bytes * (w_out * h_out)) // (w_in * h_in))
        |         AS n_bytes_out
        |FROM r""".stripMargin,

    // Mirrors MultiModal.frameSamplePlan: n_bytes DIV 64 full frames,
    // every 4th frame's index and byte offset; short payloads yield no
    // rows.
    "mm_frame_sample" ->
      """SELECT doc_id, n_frames, frame_idx,
        |       frame_idx * 64 AS byte_off
        |FROM (
        |  SELECT doc_id, n_frames,
        |         unnest(generate_series(0, n_frames - 1, 4)) AS frame_idx
        |  FROM (SELECT doc_id, CAST(strlen(text) // 64 AS BIGINT) AS n_frames
        |        FROM documents)
        |  WHERE n_frames > 0)""".stripMargin,

    // Mirrors MultiModal.StubDecoder byte-exactly: the geometry columns
    // are pure functions of payload length, and the rolling checksum
    // (ck = ck*31 + byte, wrapping signed 64-bit) is a HUGEINT
    // list_reduce mod 2^64 mapped back to the signed range. ord() ==
    // byte value because the corpus is ASCII (payload = utf-8 of text);
    // the `<> ''` guard keeps a hypothetical empty payload at the seed
    // (DuckDB splits '' into [''] and ord('') is -1).
    "mm_decode_features" ->
      """SELECT doc_id,
        |       CAST(strlen(text) AS BIGINT) AS n_bytes,
        |       CAST(strlen(text) % 640 + 1 AS INTEGER) AS width,
        |       CAST(strlen(text) * 7 % 480 + 1 AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels,
        |       CAST(CASE WHEN ck >= 9223372036854775808::HUGEINT
        |                 THEN ck - 18446744073709551616::HUGEINT
        |                 ELSE ck END AS BIGINT) AS checksum
        |FROM (
        |  SELECT doc_id, text, list_reduce(
        |           list_prepend(1125899906842597::HUGEINT,
        |             [ord(c)::HUGEINT for c in split(text, '') if c <> '']),
        |           (acc, b) -> (acc * 31 + b) % 18446744073709551616::HUGEINT) AS ck
        |  FROM documents)""".stripMargin,

    // Mirrors MultiModal.imageRoundTrip: the PNG encode chooses every
    // value as a pure function of doc_id (geometry id%31+2 × id%23+2,
    // uniform fill (id%256, 3id%256, 7id%256), 3-band RGB), so a
    // CORRECT javax.imageio decode must hand exactly these back —
    // the oracle needs no codec, just the arithmetic. PNG is lossless;
    // any fabricated geometry or pixel drift hash-mismatches.
    "mm_imageio_decode" ->
      """SELECT doc_id,
        |       CAST(doc_id % 31 + 2 AS INTEGER) AS width,
        |       CAST(doc_id % 23 + 2 AS INTEGER) AS height,
        |       CAST(3 AS INTEGER) AS channels,
        |       CAST(doc_id % 256 AS INTEGER) AS r_first,
        |       CAST(doc_id * 3 % 256 AS INTEGER) AS g_first,
        |       CAST(doc_id * 7 % 256 AS INTEGER) AS b_first,
        |       CAST(doc_id % 256 AS INTEGER) AS r_last,
        |       CAST(doc_id * 3 % 256 AS INTEGER) AS g_last,
        |       CAST(doc_id * 7 % 256 AS INTEGER) AS b_last
        |FROM documents""".stripMargin,

    // Mirrors Chunking.chunkByTokens(32, 8): starts every 24 tokens,
    // 32-token windows (DuckDB list slice is end-INCLUSIVE), tail
    // windows adding no new tokens dropped. chunk_idx = (start−1)/step.
    "text_chunk" ->
      """WITH t AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks FROM documents),
        |x AS (
        |  SELECT doc_id, toks, len(toks) AS n,
        |         unnest(generate_series(1, len(toks), 24)) AS st
        |  FROM t WHERE len(toks) > 0)
        |SELECT doc_id,
        |       CAST((st - 1) // 24 AS INTEGER) AS chunk_idx,
        |       CAST(st AS INTEGER) AS chunk_start,
        |       CAST(least(32, n - st + 1) AS INTEGER) AS n_chunk_tokens,
        |       array_to_string(toks[st : st + 31], ' ') AS chunk_text
        |FROM x
        |WHERE st = 1 OR n - st + 1 > 8""".stripMargin,

    // Mirrors Profile.driftChiSquare: agg_histogram bucket law at 10
    // buckets, marginals as windows over the counts, the telescoped
    // χ² = Σ o²N/(n_g·N_b) − n_g with each term an exact-integer ratio
    // (HUGEINT numerator ↔ Spark decimal(38,0)), one double division,
    // 0-dp round, integer sum.
    "drift_chisq" ->
      """WITH b AS (
        |  SELECT event_type,
        |         CASE WHEN value < 0.0 THEN -1
        |              WHEN value >= 500.0 THEN 10
        |              ELSE CAST(floor((value - 0.0) / 50.0) AS INTEGER) END AS bkt
        |  FROM events),
        |c AS (SELECT event_type, bkt, count(*) AS o FROM b GROUP BY 1, 2),
        |m AS (
        |  SELECT event_type, bkt, o,
        |         sum(o) OVER (PARTITION BY bkt) AS nb,
        |         sum(o) OVER (PARTITION BY event_type) AS ng,
        |         sum(o) OVER () AS N
        |  FROM c),
        |t AS (
        |  SELECT event_type, ng,
        |         CAST(round(CAST(CAST(o AS HUGEINT) * o * N * 10000 AS DOUBLE)
        |                    / CAST(CAST(ng AS HUGEINT) * nb AS DOUBLE))
        |              AS BIGINT) AS term
        |  FROM m)
        |SELECT event_type, CAST(max(ng) AS BIGINT) AS n,
        |       CAST(sum(term) - max(ng) * 10000 AS DOUBLE) / 1e4 AS chi_square
        |FROM t GROUP BY 1""".stripMargin,

    // Mirrors Profile.minmaxScale: cents-scaled group min/max, exact
    // integer ratio ×10⁴, one double division, NULL for constant groups.
    "scalar_minmax" ->
      """WITH s AS (
        |  SELECT event_type,
        |         min(CAST(round(value * 100) AS BIGINT)) AS mn,
        |         max(CAST(round(value * 100) AS BIGINT)) AS mx
        |  FROM events GROUP BY 1)
        |SELECT event_id, event_type, value,
        |       CASE WHEN mx > mn THEN
        |         round((CAST(round(value * 100) AS BIGINT) - mn) * 10000.0
        |               / (mx - mn)) / 1e4
        |         END AS minmax
        |FROM events JOIN s USING (event_type)""".stripMargin,

    // Mirrors Profile.filterFunnel: cumulative-conjunction counts in
    // one scan, a row per stage, integer-scaled pass_pct.
    "quality_funnel" ->
      """WITH a AS (
        |  SELECT count(*) AS n0,
        |         CAST(sum(CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END)
        |              AS BIGINT) AS p1,
        |         CAST(sum(CASE WHEN n_chars >= 150 AND lang = 'en'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS p2,
        |         CAST(sum(CASE WHEN n_chars >= 150 AND lang = 'en'
        |                        AND n_chars <= 450
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS p3,
        |         CAST(sum(CASE WHEN n_chars >= 150 AND lang = 'en'
        |                        AND n_chars <= 450 AND source <> 'src3'
        |                       THEN 1 ELSE 0 END) AS BIGINT) AS p4
        |  FROM documents),
        |f AS (
        |  SELECT 1 AS stage_idx, 'min_chars' AS stage, n0 AS n_in, p1 AS n_pass FROM a
        |  UNION ALL
        |  SELECT 2, 'english', p1, p2 FROM a
        |  UNION ALL
        |  SELECT 3, 'max_chars', p2, p3 FROM a
        |  UNION ALL
        |  SELECT 4, 'source_ok', p3, p4 FROM a)
        |SELECT CAST(stage_idx AS INTEGER) AS stage_idx, stage, n_in, n_pass,
        |       n_in - n_pass AS n_dropped,
        |       CASE WHEN n_in > 0
        |            THEN round(n_pass * 10000.0 / n_in) / 1e4 END AS pass_pct
        |FROM f""".stripMargin,

    // Mirrors Sampling.mixtureResample(4:3:2:1:1 over src0..src4,
    // salt "mix"): bottleneck = min (n/wt, source), keep_bp/10⁴ =
    // (w_s·n_m)/(w_m·n_s) floored after one mirrored double division,
    // membership on the 10⁴-grain md5 bucket.
    "sample_mixture" ->
      """WITH w(source, wt) AS (
        |  VALUES ('src0', 4), ('src1', 3), ('src2', 2), ('src3', 1), ('src4', 1)),
        |c AS (SELECT source, count(*) AS n FROM documents GROUP BY 1),
        |j AS (SELECT c.source, n, wt FROM c JOIN w USING (source)),
        |m AS (SELECT n AS nm, wt AS wm FROM j
        |      ORDER BY CAST(n AS DOUBLE) / wt, source LIMIT 1),
        |r AS (SELECT source,
        |             CAST(floor(10000.0 * wt * nm / (wm * n)) AS INTEGER)
        |               AS keep_bp
        |      FROM j, m)
        |SELECT doc_id, source
        |FROM documents JOIN r USING (source)
        |WHERE CAST(('0x' || substr(md5(doc_id::VARCHAR || 'mix'), 1, 15))::BIGINT
        |           % 10000 AS INTEGER) < keep_bp""".stripMargin,

    // Mirrors Sampling.tokenBudgetSample: md5-ordered per-source
    // running token total (rows-preceding window), kept iff the
    // preceding total sits under the source's budget.
    "sample_token_budget" ->
      s"""WITH t AS (SELECT doc_id, source,
        |         CAST(len(${wsToks("text")}) AS BIGINT) AS n_tokens,
        |         md5(doc_id::VARCHAR || 'graft') AS ord
        |       FROM documents),
        |c AS (SELECT doc_id, source, n_tokens,
        |        CAST(coalesce(sum(n_tokens) OVER (
        |          PARTITION BY source ORDER BY ord, doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS cum_before
        |      FROM t)
        |SELECT doc_id, source, n_tokens, cum_before,
        |       cum_before < CASE source WHEN 'src0' THEN 2000
        |                                WHEN 'src1' THEN 500
        |                                ELSE 1000 END AS kept
        |FROM c""".stripMargin,

    // Mirrors Dedup.canonicalPerCluster over the dedup_components
    // closure: same exact recursive-CTE labels, then the longest member
    // per cluster (doc id tiebreak).
    "dedup_canonical" ->
      s"""WITH RECURSIVE pairs AS (
         |$dedupNgramSql
         |),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT node, min(r) AS label FROM reach GROUP BY node)
         |SELECT cluster, canonical_doc_id, n_chars FROM (
         |  SELECT comp.label AS cluster, comp.node AS canonical_doc_id,
         |         d.n_chars,
         |         row_number() OVER (PARTITION BY comp.label
         |           ORDER BY d.n_chars DESC, comp.node) AS rk
         |  FROM comp JOIN documents d ON comp.node = d.doc_id)
         |WHERE rk = 1""".stripMargin,

    // Mirrors dedupCanonicalShared: the same exact closure as
    // dedup_components, labels joined with the per-cluster canonical
    // pick (longest member, id tiebreak) — one row per clustered doc.
    "dedup_canonical_shared" ->
      s"""WITH RECURSIVE pairs AS (
         |$dedupNgramSql
         |),
         |edges AS (SELECT id_a AS a, id_b AS b FROM pairs
         |          UNION SELECT id_b, id_a FROM pairs),
         |reach AS (
         |  SELECT a AS node, a AS r FROM edges
         |  UNION
         |  SELECT reach.node, e.b FROM reach JOIN edges e ON reach.r = e.a),
         |comp AS (SELECT node, min(r) AS label FROM reach GROUP BY node),
         |canon AS (
         |  SELECT cluster, canonical_doc_id FROM (
         |    SELECT comp.label AS cluster, comp.node AS canonical_doc_id,
         |           row_number() OVER (PARTITION BY comp.label
         |             ORDER BY d.n_chars DESC, comp.node) AS rk
         |    FROM comp JOIN documents d ON comp.node = d.doc_id)
         |  WHERE rk = 1)
         |SELECT comp.node AS doc_id, comp.label, canon.canonical_doc_id
         |FROM comp JOIN canon ON canon.cluster = comp.label""".stripMargin,

    // Mirrors TextOps.normalizeText: DuckDB nfc_normalize +
    // strip_accents are the twins of the codegen'd
    // NfcNormalizeExpr/StripAccentsExpr (semantics spec-pinned on
    // non-ASCII literals; the corpus itself is ASCII).
    "text_normalize" ->
      """SELECT doc_id,
        |       regexp_replace(lower(trim(strip_accents(nfc_normalize(text)))),
        |                      '\s+', ' ', 'g') AS canon
        |FROM documents""".stripMargin,

    // Mirrors SeriesOps.sequenceFunnel(view→click→purchase): per step,
    // first qualifying time per user strictly after the previous
    // step's. epoch_us(ts) matches the engine's µs truncation of the
    // nanos parquet timestamps (plain ts would compare at ns).
    "events_funnel" ->
      """WITH e AS (SELECT user_id, event_type, epoch_us(ts) AS u FROM events),
        |s1 AS (SELECT user_id, min(u) AS t FROM e
        |       WHERE event_type = 'view' GROUP BY 1),
        |s2 AS (SELECT e.user_id, min(u) AS t FROM e
        |       JOIN s1 ON e.user_id = s1.user_id AND e.u > s1.t
        |       WHERE event_type = 'click' GROUP BY 1),
        |s3 AS (SELECT e.user_id, min(u) AS t FROM e
        |       JOIN s2 ON e.user_id = s2.user_id AND e.u > s2.t
        |       WHERE event_type = 'purchase' GROUP BY 1),
        |f AS (
        |  SELECT 1 AS step_idx, 'view' AS step, count(*) AS n_users FROM s1
        |  UNION ALL SELECT 2, 'click', count(*) FROM s2
        |  UNION ALL SELECT 3, 'purchase', count(*) FROM s3)
        |SELECT CAST(step_idx AS INTEGER) AS step_idx, step, n_users,
        |       CASE WHEN lag(n_users) OVER (ORDER BY step_idx) > 0
        |            THEN round(n_users * 10000.0
        |                       / lag(n_users) OVER (ORDER BY step_idx)) / 1e4
        |            END AS conv_pct
        |FROM f""".stripMargin,

    // Mirrors TextOps.gopherSignals: the Gopher rule battery with
    // every gate in exact integer space (no float boundary can flip a
    // flag between engines) and 4-dp integer-scaled display ratios.
    "quality_gopher" ->
      """WITH w AS (SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
        |           FROM documents),
        |s AS (SELECT doc_id,
        |        CAST(len(toks) AS BIGINT) AS n_words,
        |        CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
        |          AS BIGINT) AS sum_chars,
        |        CAST(len(list_filter(toks,
        |          t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |        CAST(len(list_filter(toks, t -> list_contains(
        |          ['the','be','to','of','and','that','have','with'], t)))
        |          AS BIGINT) AS n_stop,
        |        CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym
        |      FROM w)
        |SELECT doc_id, n_words, n_stop,
        |       round(CAST(sum_chars * 10000 AS DOUBLE) / n_words) / 10000
        |         AS mean_word_len,
        |       round(CAST(n_alpha * 10000 AS DOUBLE) / n_words) / 10000
        |         AS frac_alpha,
        |       (n_words >= 50 AND n_words <= 100000) AS keep_words,
        |       (sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words) AS keep_mwl,
        |       (5 * n_alpha >= 4 * n_words) AS keep_alpha,
        |       (n_stop >= 2) AS keep_stop,
        |       (10 * n_sym <= n_words) AS keep_symbol,
        |       ((n_words >= 50 AND n_words <= 100000)
        |         AND (sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words)
        |         AND (5 * n_alpha >= 4 * n_words)
        |         AND (n_stop >= 2)
        |         AND (10 * n_sym <= n_words)) AS keep
        |FROM s""".stripMargin,

    // Mirrors curateCorpusGopher: Gopher keep-gate (exact integer
    // comparisons) → exact dedup (min doc_id per canonical-md5 group)
    // → 5-gram benchmark decontamination → md5-keyed 90/10 split.
    "curate_corpus_gopher" ->
      """WITH g0 AS (
        |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
        |  FROM documents WHERE doc_id % 20 <> 0),
        |s AS (SELECT doc_id, text,
        |        CAST(len(toks) AS BIGINT) AS n_words,
        |        CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
        |          AS BIGINT) AS sum_chars,
        |        CAST(len(list_filter(toks,
        |          t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |        CAST(len(list_filter(toks, t -> list_contains(
        |          ['the','be','to','of','and','that','have','with'], t)))
        |          AS BIGINT) AS n_stop,
        |        CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym
        |      FROM g0),
        |kept AS (
        |  SELECT doc_id, text, n_words FROM s
        |  WHERE n_words >= 50 AND n_words <= 100000
        |    AND sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words
        |    AND 5 * n_alpha >= 4 * n_words
        |    AND n_stop >= 2
        |    AND 10 * n_sym <= n_words),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |deduped AS (
        |  SELECT k.* FROM kept k
        |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
        |w AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                          || ' ' || toks[i+3] || ' ' || toks[i+4]
        |                        for i in generate_series(1, len(toks) - 4)]) AS s
        |       FROM w WHERE len(toks) >= 5),
        |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 20 = 0),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 20 <> 0) t
        |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.shingle = t.shingle)),
        |cleaned AS (
        |  SELECT * FROM deduped d
        |  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id))
        |SELECT doc_id, n_words,
        |       CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
        |FROM (
        |  SELECT doc_id, n_words,
        |         CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
        |              % 100 AS INTEGER) AS bucket
        |  FROM cleaned)""".stripMargin,

    // Mirrors TextOps.tokenStats: whitespace vs regex tokenization
    // with type-token ratio; the regex class is identical RE2/Java
    // syntax ([^\p{L}\p{N}]+ over lowercased text).
    "text_tokens_regex" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS ws,
        |             list_filter(regexp_split_to_array(lower(text),
        |               '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS re
        |           FROM documents)
        |SELECT doc_id,
        |       CAST(len(ws) AS BIGINT) AS n_ws_tokens,
        |       CAST(len(re) AS BIGINT) AS n_re_tokens,
        |       CAST(len(list_distinct(re)) AS BIGINT) AS n_types,
        |       round(CAST(len(list_distinct(re)) * 10000 AS DOUBLE) / len(re))
        |         / 10000 AS ttr
        |FROM t WHERE len(re) > 0""".stripMargin,

    // Mirrors TextOps.lmSurprisal: corpus bigram LM from adjacent
    // regex-token pairs (list_zip of the token list against its tail),
    // per-occurrence surprisal as the exact bit position
    // length(bin(c_prefix // c_bg)) - 1 — integral division preserves
    // floor(log2(a/b)) for a ≥ b ≥ 1, so no libm log crosses the gate.
    "quality_lm_surprisal" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |           '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM (
        |    SELECT doc_id, unnest(list_zip(t[:-2], t[2:])) AS z FROM toks)),
        |lm AS (SELECT w1, w2, count(*) AS c_bg FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_prefix
        |        FROM lm GROUP BY 1),
        |occ AS (
        |  SELECT doc_id, length(bin(c_prefix // c_bg)) - 1 AS bits,
        |         CASE WHEN c_bg <= 2 THEN 1 ELSE 0 END AS rare
        |  FROM bg JOIN lm USING (w1, w2) JOIN pfx USING (w1)),
        |per AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(bits) AS BIGINT) AS sum_bits,
        |         CAST(sum(rare) AS BIGINT) AS n_rare
        |  FROM occ GROUP BY 1)
        |SELECT doc_id,
        |       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(coalesce(sum_bits, 0) AS BIGINT) AS sum_bits,
        |       CAST(coalesce(n_rare, 0) AS BIGINT) AS n_rare,
        |       CASE WHEN coalesce(n_bigrams, 0) > 0
        |         THEN round(sum_bits * 10000.0 / n_bigrams) / 10000
        |       END AS bits_per_bigram,
        |       CASE WHEN coalesce(n_bigrams, 0) > 0
        |         THEN round(n_rare * 10000.0 / n_bigrams) / 10000
        |       END AS rare_ratio
        |FROM documents LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors TextOps.dsirWeights (target = lang 'en'): two bigram LMs
    // trained on the target slice vs the rest, per-occurrence weight =
    // bits_source − bits_target in exact floor-log2 space, OOV counted
    // not smoothed. Negative numerators round identically: both
    // engines' round() is half-away-from-zero.
    "quality_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |         list_filter(regexp_split_to_array(lower(text),
        |           '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, tgt, z[1] AS w1, z[2] AS w2 FROM (
        |    SELECT doc_id, tgt, unnest(list_zip(t[:-2], t[2:])) AS z
        |    FROM toks)),
        |tc AS (SELECT w1, w2, count(*) AS c_t FROM bg WHERE tgt GROUP BY 1, 2),
        |tp AS (SELECT w1, CAST(sum(c_t) AS BIGINT) AS p_t FROM tc GROUP BY 1),
        |sc AS (SELECT w1, w2, count(*) AS c_s FROM bg WHERE NOT tgt
        |       GROUP BY 1, 2),
        |sp AS (SELECT w1, CAST(sum(c_s) AS BIGINT) AS p_s FROM sc GROUP BY 1),
        |occ AS (
        |  SELECT doc_id,
        |         c_t IS NOT NULL AND c_s IS NOT NULL AS in_both,
        |         CASE WHEN c_t IS NOT NULL AND c_s IS NOT NULL
        |           THEN (length(bin(p_s // c_s)) - 1)
        |                - (length(bin(p_t // c_t)) - 1)
        |           ELSE 0 END AS w,
        |         CASE WHEN c_t IS NULL THEN 1 ELSE 0 END AS oov_t,
        |         CASE WHEN c_s IS NULL THEN 1 ELSE 0 END AS oov_s
        |  FROM bg
        |  LEFT JOIN tc USING (w1, w2) LEFT JOIN tp USING (w1)
        |  LEFT JOIN sc USING (w1, w2) LEFT JOIN sp USING (w1)),
        |per AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_scored,
        |         CAST(sum(oov_t) AS BIGINT) AS n_oov_target,
        |         CAST(sum(oov_s) AS BIGINT) AS n_oov_source,
        |         CAST(sum(w) AS BIGINT) AS weight_bits
        |  FROM occ GROUP BY 1)
        |SELECT doc_id,
        |       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(coalesce(n_scored, 0) AS BIGINT) AS n_scored,
        |       CAST(coalesce(n_oov_target, 0) AS BIGINT) AS n_oov_target,
        |       CAST(coalesce(n_oov_source, 0) AS BIGINT) AS n_oov_source,
        |       CAST(coalesce(weight_bits, 0) AS BIGINT) AS weight_bits,
        |       CASE WHEN coalesce(n_scored, 0) > 0
        |         THEN round(weight_bits * 10000.0 / n_scored) / 10000
        |       END AS mean_weight
        |FROM documents LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors TextOps.lmAndDsir: the surprisal + DSIR fusion — one
    // bigram stream, one LM CTE carrying the total count plus
    // nullif'd target/source counts (null ⇔ absent from that LM,
    // matching the standalone operators' failed joins), per-doc stats
    // of both operators in one aggregate. Values must equal the two
    // standalone queries column for column.
    "quality_lm_dsir" ->
      """WITH toks AS (
        |  SELECT doc_id, lang = 'en' AS tgt,
        |         list_filter(regexp_split_to_array(lower(text),
        |           '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, tgt, z[1] AS w1, z[2] AS w2 FROM (
        |    SELECT doc_id, tgt, unnest(list_zip(t[:-2], t[2:])) AS z
        |    FROM toks)),
        |lm AS (SELECT w1, w2, count(*) AS c_bg,
        |         nullif(sum(CASE WHEN tgt THEN 1 ELSE 0 END), 0) AS c_t,
        |         nullif(sum(CASE WHEN NOT tgt THEN 1 ELSE 0 END), 0) AS c_s
        |       FROM bg GROUP BY 1, 2),
        |pfx AS (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_prefix,
        |               CAST(sum(c_t) AS BIGINT) AS p_t,
        |               CAST(sum(c_s) AS BIGINT) AS p_s
        |        FROM lm GROUP BY 1),
        |occ AS (
        |  SELECT doc_id,
        |         length(bin(c_prefix // c_bg)) - 1 AS bits,
        |         CASE WHEN c_bg <= 2 THEN 1 ELSE 0 END AS rare,
        |         c_t IS NOT NULL AND c_s IS NOT NULL AS in_both,
        |         CASE WHEN c_t IS NOT NULL AND c_s IS NOT NULL
        |           THEN (length(bin(p_s // c_s)) - 1)
        |                - (length(bin(p_t // c_t)) - 1)
        |           ELSE 0 END AS w,
        |         CASE WHEN c_t IS NULL THEN 1 ELSE 0 END AS oov_t,
        |         CASE WHEN c_s IS NULL THEN 1 ELSE 0 END AS oov_s
        |  FROM bg LEFT JOIN lm USING (w1, w2) LEFT JOIN pfx USING (w1)),
        |per AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(bits) AS BIGINT) AS sum_bits,
        |         CAST(sum(rare) AS BIGINT) AS n_rare,
        |         CAST(sum(CASE WHEN in_both THEN 1 ELSE 0 END) AS BIGINT)
        |           AS n_scored,
        |         CAST(sum(oov_t) AS BIGINT) AS n_oov_target,
        |         CAST(sum(oov_s) AS BIGINT) AS n_oov_source,
        |         CAST(sum(w) AS BIGINT) AS weight_bits
        |  FROM occ GROUP BY 1)
        |SELECT doc_id,
        |       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(coalesce(sum_bits, 0) AS BIGINT) AS sum_bits,
        |       CAST(coalesce(n_rare, 0) AS BIGINT) AS n_rare,
        |       CAST(coalesce(n_scored, 0) AS BIGINT) AS n_scored,
        |       CAST(coalesce(n_oov_target, 0) AS BIGINT) AS n_oov_target,
        |       CAST(coalesce(n_oov_source, 0) AS BIGINT) AS n_oov_source,
        |       CAST(coalesce(weight_bits, 0) AS BIGINT) AS weight_bits,
        |       CASE WHEN coalesce(n_bigrams, 0) > 0
        |         THEN round(sum_bits * 10000.0 / n_bigrams) / 10000
        |       END AS bits_per_bigram,
        |       CASE WHEN coalesce(n_bigrams, 0) > 0
        |         THEN round(n_rare * 10000.0 / n_bigrams) / 10000
        |       END AS rare_ratio,
        |       CASE WHEN coalesce(n_scored, 0) > 0
        |         THEN round(weight_bits * 10000.0 / n_scored) / 10000
        |       END AS mean_weight
        |FROM documents LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors Bpe.trainMerges(nMerges = 8): each stage's winning pair
    // becomes one merge row; a pair-exhausted stage emits nothing.
    "vocab_bpe_merges" ->
      s"""WITH ${bpeCtes(8)}
         |${(1 to 8).map(i =>
              s"SELECT CAST($i AS INTEGER) AS step, l AS lhs, r AS rhs, " +
              s"l || r AS merged, cnt AS pair_count FROM b$i")
            .mkString("\nUNION ALL\n")}""".stripMargin,

    // Mirrors Bpe.segment with the merges trained on the same corpus:
    // BPE inference is the training-order replay, so the segmentation
    // IS the final training stage's word table.
    "vocab_bpe_segment" ->
      s"""WITH ${bpeCtes(8)}
         |SELECT word, freq, symbols AS seg,
         |       CAST(len(string_split(symbols, '~')) AS INTEGER) AS n_tokens
         |FROM w8""".stripMargin,

    // Mirrors textTokensBpe: per-doc occurrence stream joined to the
    // final training stage's per-word segmentation, token count =
    // segment length. LEFT JOIN + coalesce covers token-less docs.
    "text_tokens_bpe" ->
      s"""WITH ${bpeCtes(8)},
         |seg AS (SELECT word,
         |          CAST(len(string_split(symbols, '~')) AS BIGINT) AS n_tok
         |        FROM w8),
         |occ AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
         |          lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)) AS word
         |        FROM documents),
         |per AS (SELECT doc_id, count(*) AS n_words,
         |               CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
         |        FROM occ JOIN seg USING (word) GROUP BY 1)
         |SELECT doc_id,
         |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
         |       CAST(coalesce(n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens
         |FROM documents LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors vocabBpeShared: ONE training replay (the shared w8/b_i
    // stages) feeding both consumers — corpus-level vocab scalars and
    // the per-doc token pricing join; n_merges counts the b_i winner
    // rows exactly as the trainer's early-stop would leave them.
    "vocab_bpe_shared" ->
      s"""WITH ${bpeCtes(8)},
         |seg AS (SELECT word, freq,
         |          CAST(len(string_split(symbols, '~')) AS BIGINT) AS n_tok
         |        FROM w8),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS n_vocab_words,
         |                 CAST(sum(freq * n_tok) AS BIGINT) AS corpus_tokens
         |          FROM seg),
         |nm AS (SELECT CAST(${(1 to 8).map(i => s"(SELECT count(*) FROM b$i)").mkString(" + ")}
         |         AS INTEGER) AS n_merges),
         |occ AS (SELECT doc_id, unnest(list_filter(regexp_split_to_array(
         |          lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)) AS word
         |        FROM documents),
         |per AS (SELECT doc_id, count(*) AS n_words,
         |               CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens
         |        FROM occ JOIN seg USING (word) GROUP BY 1)
         |SELECT doc_id,
         |       CAST(coalesce(n_words, 0) AS BIGINT) AS n_words,
         |       CAST(coalesce(n_bpe_tokens, 0) AS BIGINT) AS n_bpe_tokens,
         |       n_vocab_words, corpus_tokens, n_merges
         |FROM documents LEFT JOIN per USING (doc_id)
         |CROSS JOIN stats CROSS JOIN nm""".stripMargin,

    // Mirrors operators.ZOrder.rangeStats over events (user_id ×
    // floor(value)): broadcast min/max bounds, affine grid scaling in
    // exact integral arithmetic (// ≡ Spark DIV on non-negatives) with
    // the same wide-range overflow branch as ZOrder.withZKey, Morton
    // interleave (8 bits/dim), top-5-bit z-range buckets.
    "layout_zorder" ->
      s"""WITH e AS (SELECT CAST(user_id AS BIGINT) AS x,
         |             CAST(floor(value) AS BIGINT) AS y FROM events),
         |b AS (SELECT min(x) AS x_lo, max(x) AS x_hi,
         |             min(y) AS y_lo, max(y) AS y_hi FROM e),
         |k AS (SELECT x, y,
         |        CASE WHEN (x_hi - x_lo) < ${Long.MaxValue >> 8}
         |          THEN ((x - x_lo) * 256) // ((x_hi - x_lo) + 1)
         |          ELSE (x - x_lo) // (((x_hi - x_lo) // 256) + 1) END AS xq,
         |        CASE WHEN (y_hi - y_lo) < ${Long.MaxValue >> 8}
         |          THEN ((y - y_lo) * 256) // ((y_hi - y_lo) + 1)
         |          ELSE (y - y_lo) // (((y_hi - y_lo) // 256) + 1) END AS yq
         |      FROM e CROSS JOIN b),
         |z AS (SELECT x, y, ${mortonSql("xq", "yq", 8)} AS zkey FROM k)
         |SELECT CAST(zkey >> 11 AS INTEGER) AS bucket, count(*) AS n_rows,
         |       min(x) AS x_min, max(x) AS x_max,
         |       min(y) AS y_min, max(y) AS y_max,
         |       min(zkey) AS z_min, max(zkey) AS z_max
         |FROM z GROUP BY 1""".stripMargin,

    // Mirrors TrainingOrder.withOrder: md5(key ‖ salt ‖ ':' ‖ epoch)
    // order key, top-60-bit shard bucket (the sample_hash conversion,
    // proven bit-identical there).
    "layout_shuffle" ->
      """SELECT doc_id, source,
        |       md5(doc_id::VARCHAR || 'graft:1') AS shuffle_key,
        |       CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft:1'), 1, 15))::BIGINT
        |            % 8 AS INTEGER) AS shard
        |FROM documents""".stripMargin,

    // Mirrors Dedup.spanDedupByTokens: non-overlapping 5-token windows
    // (the text_chunk slice machinery at overlap 0), global
    // first-occurrence by (doc, pos) — min(struct) ↔ the row_number
    // window, identical total order — and ORDER BY pos reassembly ↔
    // the array_sort(collect_list(struct)) join. Span-less docs keep a
    // (0, 0, '') row via the left joins.
    "dedup_spans" ->
      s"""WITH t AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
         |x AS (SELECT doc_id, len(toks) AS n, toks,
         |        unnest(generate_series(1, len(toks), 5)) AS st
         |      FROM t WHERE len(toks) > 0),
         |ex AS (SELECT doc_id, (st - 1) // 5 AS pos,
         |         array_to_string(toks[st : st + 4], ' ') AS span FROM x),
         |k AS (SELECT doc_id, pos, span,
         |        row_number() OVER (PARTITION BY span
         |                           ORDER BY doc_id, pos) AS rn FROM ex),
         |stats AS (SELECT doc_id, count(*) AS n_spans FROM ex GROUP BY 1),
         |re AS (SELECT doc_id, count(*) AS n_kept,
         |         string_agg(span, ' ' ORDER BY pos) AS text_dedup
         |       FROM k WHERE rn = 1 GROUP BY doc_id)
         |SELECT d.doc_id,
         |       coalesce(n_spans, 0) AS n_spans,
         |       coalesce(n_kept, 0) AS n_kept,
         |       coalesce(text_dedup, '') AS text_dedup
         |FROM documents d
         |LEFT JOIN stats USING (doc_id)
         |LEFT JOIN re USING (doc_id)""".stripMargin
  )
}
