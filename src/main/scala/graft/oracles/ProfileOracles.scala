package graft

import graft.OracleCtes._

/** DuckDB twins for the [[ProfileQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object ProfileOracles {
  val map: Map[String, String] = Map(
    // Mirrors TextOps.sourceOverlap (n=5): distinct (source, 5-gram)
    // sets, pairwise shared counts over the gram-keyed self-join,
    // Jaccard at 4 dp — string grams stand in for the hashed ones
    // (hash-injective on the corpus, the text_boilerplate precedent).
    "profile_source_overlap" ->
      s"""WITH w AS (SELECT source, ${wsToks("text")} AS toks FROM documents),
        |sh AS (SELECT source,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        || ' ' || toks[i+3] || ' ' || toks[i+4]
        |                        for i in generate_series(1, len(toks) - 4)]) AS s
        |       FROM w WHERE len(toks) >= 5),
        |ex AS (SELECT DISTINCT source AS g, unnest(s) AS sh FROM sh),
        |sizes AS (SELECT g, CAST(count(*) AS BIGINT) AS n_grams FROM ex GROUP BY 1),
        |shared AS (
        |  SELECT a.g AS src_a, b.g AS src_b, CAST(count(*) AS BIGINT) AS n_shared
        |  FROM ex a JOIN ex b ON a.sh = b.sh AND a.g < b.g
        |  GROUP BY 1, 2)
        |SELECT src_a, src_b, n_shared,
        |       sa.n_grams AS n_a, sb.n_grams AS n_b,
        |       round(CAST(n_shared * 10000 AS DOUBLE)
        |             / (sa.n_grams + sb.n_grams - n_shared)) / 10000 AS jaccard
        |FROM shared
        |JOIN sizes sa ON sa.g = src_a
        |JOIN sizes sb ON sb.g = src_b""".stripMargin,
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
        |           + 0.0
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
        |           + 0.0
        |         END AS slope,
        |       CASE WHEN n * sxx - sx * sx > 0 THEN
        |         round((CAST(sy AS DOUBLE)
        |                - CAST(n * sxy - sx * sy AS DOUBLE)
        |                  / CAST(n * sxx - sx * sx AS DOUBLE)
        |                  * CAST(sx AS DOUBLE)) / n / 100 * 10000) / 10000
        |           + 0.0
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
    "scalar_robust_z" ->
      """WITH m AS (SELECT event_id, event_type, value,
        |             CAST(round(value * 1e6) AS BIGINT) AS micro FROM events),
        |med AS (SELECT event_type, quantile_cont(micro, 0.5) AS med
        |        FROM m GROUP BY 1),
        |d AS (SELECT event_id, event_type, value,
        |        abs(2 * micro - 2 * med) AS dev2
        |      FROM m JOIN med USING (event_type)),
        |mad AS (SELECT event_type, quantile_cont(dev2, 0.5) AS mad2
        |        FROM d GROUP BY 1)
        |SELECT event_id, event_type, value,
        |       dev2 / 2 / 1e6 AS deviation,
        |       mad2 / 2 / 1e6 AS mad,
        |       dev2 > 3 * mad2 AS is_outlier
        |FROM d JOIN mad USING (event_type)""".stripMargin,

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

    // Mirrors Profile.corpusReport: the quality_gopher counter battery
    // and keep gate, the dedup_exact canonical fingerprint, then three
    // per-source aggregates (doc sums, distinct-fingerprint reduction,
    // distinct-lang reduction) joined on source.
    "report_corpus" -> corpusReportSql,

    // The incremental form folds two disjoint batches into counted
    // state and reports from state alone; fold(A) + fold(B) must equal
    // scan(A ∪ B) exactly — distinct-fingerprint and distinct-lang
    // reductions included — so it binds the SAME SQL (shared val): a
    // double-counted partial, a dropped fingerprint group, or ratio
    // drift between the two forms hash-fails here.
    "report_corpus_incremental" -> corpusReportSql
  )

  private lazy val corpusReportSql: String =
      """WITH w AS (SELECT doc_id, source, lang, text,
        |             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
        |             list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
        |           FROM documents),
        |s AS (SELECT source, lang, fp,
        |        CAST(len(toks) AS BIGINT) AS n_words,
        |        CAST(coalesce(list_sum(list_transform(toks, t -> length(t))), 0)
        |          AS BIGINT) AS sum_chars,
        |        CAST(len(list_filter(toks,
        |          t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
        |        CAST(len(list_filter(toks, t -> list_contains(
        |          ['the','be','to','of','and','that','have','with'], t)))
        |          AS BIGINT) AS n_stop,
        |        CAST(len(regexp_extract_all(text, '#|\.\.\.')) AS BIGINT) AS n_sym
        |      FROM w),
        |k AS (SELECT source, lang, fp, n_words,
        |        ((n_words >= 50 AND n_words <= 100000)
        |          AND (sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words)
        |          AND (5 * n_alpha >= 4 * n_words)
        |          AND (n_stop >= 2)
        |          AND (10 * n_sym <= n_words)) AS keep
        |      FROM s),
        |base AS (SELECT source, count(*) AS n_docs,
        |           CAST(sum(n_words) AS BIGINT) AS n_tokens,
        |           CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_keep
        |         FROM k GROUP BY 1),
        |uniq AS (SELECT source, count(*) AS n_uniq
        |         FROM (SELECT source, fp FROM k GROUP BY 1, 2) GROUP BY 1),
        |langs AS (SELECT source, count(*) AS n_langs
        |          FROM (SELECT DISTINCT source, lang FROM k) GROUP BY 1)
        |SELECT source, n_docs, n_tokens,
        |       round(n_tokens * 10000.0 / n_docs) / 10000 AS mean_doc_tokens,
        |       n_langs,
        |       n_docs - n_uniq AS n_exact_dup,
        |       round((n_docs - n_uniq) * 10000.0 / n_docs) / 10000 AS dup_ratio,
        |       n_keep,
        |       round(n_keep * 10000.0 / n_docs) / 10000 AS keep_ratio
        |FROM base JOIN uniq USING (source) JOIN langs USING (source)""".stripMargin
}
