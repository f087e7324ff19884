package graft

import graft.OracleCtes._

/** DuckDB twins for the [[CompositeQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object CompositeOracles {
  val map: Map[String, String] = Map(
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
        |         CAST(((CASE WHEN n_tokens > 0 THEN least(300000, greatest(0,
        |             50 * CAST(round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) AS BIGINT) + 150000
        |             - 3 * abs(CAST(round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) AS BIGINT) - 50000)))
        |           ELSE 0 END)
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

    // Per-doc first-failing-stage attribution over the SAME CTE chain
    // as curate_corpus (quality gate → exact-hash keep-set → 5-gram
    // bench decontam): one row per train doc; survivors read 'kept'.
    "curate_corpus_audit" ->
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
        |         CAST(((CASE WHEN n_tokens > 0 THEN least(300000, greatest(0,
        |             50 * CAST(round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) AS BIGINT) + 150000
        |             - 3 * abs(CAST(round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) AS BIGINT) - 50000)))
        |           ELSE 0 END)
        |           + 15) // 30 AS DOUBLE) / 10000 AS quality_score
        |  FROM sig),
        |kept AS (SELECT * FROM q WHERE quality_score >= 0.5),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
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
        |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.shingle = t.shingle))
        |SELECT doc_id, quality_score,
        |       CASE WHEN quality_score < 0.5 THEN 'quality'
        |            WHEN NOT EXISTS (SELECT 1 FROM keep k WHERE k.doc_id = q.doc_id) THEN 'dedup'
        |            WHEN EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = q.doc_id) THEN 'decontam'
        |            ELSE 'kept' END AS stage
        |FROM q""".stripMargin,

    // Mirrors curateCorpusClassified: the trained NB-log-odds gate
    // (the quality_classifier CTE chain, model trained on the FULL
    // corpus's doc_id%3 slice) over the doc_id%20<>0 candidates, then
    // exact dedup → 5-gram decontam → split — the curate_corpus tail.
    "curate_corpus_classified" -> {
      val b = 1 << 18
      raw"""WITH wt AS (SELECT doc_id, lang, text,
        |    list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'),
        |      t -> t <> '') AS toks FROM documents),
        |feats AS (SELECT doc_id, lang, text, list_distinct(
        |    [ (md5_number_lower(toks[i])
        |         % ${graft.functions.PortableHash.PSql}::UBIGINT)::BIGINT % $b
        |      for i in generate_series(1, len(toks)) ]
        |    || [ (md5_number_lower(toks[i] || ' ' || toks[i+1])
        |            % ${graft.functions.PortableHash.PSql}::UBIGINT)::BIGINT % $b
        |         for i in generate_series(1, len(toks) - 1) ]) AS fs
        |  FROM wt),
        |trn AS (SELECT doc_id, lang = 'en' AS pos, fs FROM feats
        |        WHERE doc_id % 3 = 0),
        |trex AS (SELECT pos, unnest(fs) AS g FROM trn),
        |dfc AS (SELECT g,
        |          CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS df_pos,
        |          CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS df_neg
        |        FROM trex GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |               CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        |        FROM trn),
        |wts AS (SELECT g,
        |          ((length(bin(df_pos + 1)) - 1) - (length(bin(n_pos + 1)) - 1))
        |          - ((length(bin(df_neg + 1)) - 1) - (length(bin(n_neg + 1)) - 1)) AS w
        |        FROM dfc CROSS JOIN tot),
        |fex AS (SELECT doc_id, unnest(fs) AS g FROM feats WHERE len(fs) > 0),
        |per AS (SELECT doc_id, count(*) AS n_feats,
        |          CAST(sum(coalesce(w, 0)) AS BIGINT) AS score
        |        FROM fex LEFT JOIN wts USING (g) GROUP BY 1),
        |posex AS (SELECT doc_id, unnest(fs) AS g FROM trn
        |          WHERE pos AND len(fs) > 0),
        |posper AS (SELECT doc_id, count(*) AS n_feats,
        |             CAST(sum(coalesce(w, 0)) AS BIGINT) AS score
        |           FROM posex LEFT JOIN wts USING (g) GROUP BY 1),
        |posn AS (SELECT (score * 1000
        |                 - ((score * 1000 % n_feats) + n_feats) % n_feats)
        |                // n_feats AS norm FROM posper),
        |thr AS (SELECT quantile_cont(norm, 0.1) AS t FROM posn),
        |kept AS (SELECT d.doc_id, d.text,
        |           CAST(coalesce(score, 0) AS BIGINT) AS score
        |         FROM documents d LEFT JOIN per USING (doc_id)
        |         WHERE d.doc_id % 20 <> 0 AND coalesce(n_feats, 0) > 0
        |           AND (score * 1000
        |                - ((score * 1000 % n_feats) + n_feats) % n_feats)
        |               // n_feats >= (SELECT t FROM thr)),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |deduped AS (
        |  SELECT k.* FROM kept k
        |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                          || ' ' || toks[i+3] || ' ' || toks[i+4]
        |                        for i in generate_series(1, len(toks) - 4)]) AS s
        |       FROM wt WHERE len(toks) >= 5),
        |bench AS (SELECT DISTINCT unnest(s) AS shingle FROM sh WHERE doc_id % 20 = 0),
        |contaminated AS (
        |  SELECT DISTINCT doc_id FROM (
        |    SELECT doc_id, unnest(s) AS shingle FROM sh WHERE doc_id % 20 <> 0) t
        |  WHERE EXISTS (SELECT 1 FROM bench b WHERE b.shingle = t.shingle)),
        |cleaned AS (
        |  SELECT * FROM deduped d
        |  WHERE NOT EXISTS (SELECT 1 FROM contaminated c WHERE c.doc_id = d.doc_id))
        |SELECT doc_id, score,
        |       CASE WHEN bucket < 90 THEN 'train' ELSE 'val' END AS split
        |FROM (
        |  SELECT doc_id, score,
        |         CAST(('0x' || substr(md5(doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
        |              % 100 AS INTEGER) AS bucket
        |  FROM cleaned)""".stripMargin
    },

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
         |         CAST(((CASE WHEN n_tokens > 0 THEN least(300000, greatest(0,
         |             50 * CAST(round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) AS BIGINT) + 150000
         |             - 3 * abs(CAST(round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) AS BIGINT) - 50000)))
         |           ELSE 0 END)
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

    // Mirrors Sampling.temperatureResample(α=½, totalOut=1000, salt
    // "temp"): per-lang weight = floor(sqrt(n)·2²⁰) (sqrt and × are
    // correctly-rounded IEEE ops, bit-identical to the driver-side
    // Java walk), largest-remainder quota apportionment in exact
    // BIGINT, per-doc copies = quota // n + 1 for the quota % n docs
    // smallest by md5(doc_id‖salt).
    "sample_temperature" ->
      """WITH c AS (SELECT lang, count(*) AS n FROM documents
        |           WHERE lang IS NOT NULL GROUP BY 1),
        |w AS (SELECT lang, n,
        |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT) AS wt
        |      FROM c),
        |t AS (SELECT sum(wt) AS tw FROM w),
        |b AS (SELECT lang, n, (1000 * wt) // tw AS base, (1000 * wt) % tw AS rem
        |      FROM w, t),
        |l AS (SELECT 1000 - sum(base) AS leftover FROM b),
        |q AS (SELECT lang, n,
        |        base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
        |                      <= leftover THEN 1 ELSE 0 END AS quota
        |      FROM b, l),
        |r AS (SELECT d.doc_id, d.lang, q.quota // q.n AS cbase,
        |        q.quota % q.n AS extra,
        |        row_number() OVER (PARTITION BY d.lang
        |          ORDER BY md5(d.doc_id::VARCHAR || 'temp'), d.doc_id) AS rn
        |      FROM documents d JOIN q USING (lang))
        |SELECT doc_id, lang,
        |       CAST(cbase + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS BIGINT)
        |         AS n_copies
        |FROM r""".stripMargin,

    // Mirrors Sampling.tokenBudgetSample: md5-ordered per-source
    // running token total (rows-preceding window), kept iff the
    // preceding total sits under the source's budget.
    // Mirrors Sampling.weightedSystematic: md5-ordered per-lang
    // cumulative token weights, exact integer threshold crossings
    // ((c+w)·n // W − c·n // W), Σ n_copies = 20 per lang.
    "sample_weighted_systematic" ->
      s"""WITH t AS (SELECT doc_id, lang,
        |         CAST(len(${wsToks("text")}) AS BIGINT) AS w
        |       FROM documents),
        |tot AS (SELECT lang, sum(w) AS tw FROM t GROUP BY lang),
        |c AS (SELECT doc_id, lang, w,
        |        CAST(coalesce(sum(w) OVER (
        |          PARTITION BY lang
        |          ORDER BY md5(doc_id::VARCHAR || 'wsys'), doc_id
        |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
        |          AS BIGINT) AS cb
        |      FROM t)
        |SELECT c.doc_id, c.lang, c.w AS weight, c.cb AS cum_before,
        |       CAST(coalesce(((c.cb + c.w) * 20) // tw
        |                     - (c.cb * 20) // tw, 0) AS BIGINT) AS n_copies
        |FROM c JOIN tot USING (lang)""".stripMargin,

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

    // Mirrors curateCorpusGopher: Gopher keep-gate (exact integer
    // comparisons) → exact dedup (min doc_id per canonical-md5 group)
    // → 5-gram benchmark decontamination → md5-keyed 90/10 split.
    // Mirrors curateCorpusTemperature: the Gopher battery (the
    // curate_corpus_gopher CTEs, whole corpus), exact first-occurrence
    // keep on the whitespace-normalized md5, then the
    // sample_temperature apportionment over the CURATED per-lang
    // counts (totalOut=500, salt 'curate').
    "curate_corpus_temperature" ->
      """WITH g0 AS (
        |  SELECT doc_id, lang, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
        |  FROM documents),
        |s AS (SELECT doc_id, lang, text,
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
        |  SELECT doc_id, lang, text FROM s
        |  WHERE n_words >= 50 AND n_words <= 100000
        |    AND sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words
        |    AND 5 * n_alpha >= 4 * n_words
        |    AND n_stop >= 2
        |    AND 10 * n_sym <= n_words),
        |keep AS (
        |  SELECT min(doc_id) AS doc_id FROM kept
        |  GROUP BY md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'))),
        |ded AS (
        |  SELECT k.doc_id, k.lang FROM kept k
        |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
        |c AS (SELECT lang, count(*) AS n FROM ded
        |      WHERE lang IS NOT NULL GROUP BY 1),
        |w AS (SELECT lang, n,
        |        CAST(floor(sqrt(CAST(n AS DOUBLE)) * 1048576.0) AS BIGINT) AS wt
        |      FROM c),
        |t AS (SELECT sum(wt) AS tw FROM w),
        |b AS (SELECT lang, n, (500 * wt) // tw AS base, (500 * wt) % tw AS rem
        |      FROM w, t),
        |l AS (SELECT 500 - sum(base) AS leftover FROM b),
        |q AS (SELECT lang, n,
        |        base + CASE WHEN row_number() OVER (ORDER BY rem DESC, lang)
        |                      <= leftover THEN 1 ELSE 0 END AS quota
        |      FROM b, l),
        |r AS (SELECT d.doc_id, d.lang, q.quota // q.n AS cbase,
        |        q.quota % q.n AS extra,
        |        row_number() OVER (PARTITION BY d.lang
        |          ORDER BY md5(d.doc_id::VARCHAR || 'curate'), d.doc_id) AS rn
        |      FROM ded d JOIN q USING (lang))
        |SELECT doc_id, lang,
        |       CAST(cbase + CASE WHEN rn <= extra THEN 1 ELSE 0 END AS BIGINT)
        |         AS n_copies
        |FROM r""".stripMargin,

    // Mirrors curateCorpusSubstring: gopher gate → all-occurrence
    // duplicated-span removal over the GATED corpus (the coverage-
    // theorem gram replay, source-parametrized) → ≥30-kept-token gate
    // → md5 split. A fully-removed doc reassembles to n_kept NULL in
    // `re` → coalesce 0 → dropped by the length gate.
    "curate_corpus_substring" -> {
      val gate =
        """g0 AS (
          |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
          |  FROM documents),
          |sg AS (SELECT doc_id, text,
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
          |keptd AS MATERIALIZED (
          |  SELECT doc_id, text FROM sg
          |  WHERE n_words >= 50 AND n_words <= 100000
          |    AND sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words
          |    AND 5 * n_alpha >= 4 * n_words
          |    AND n_stop >= 2
          |    AND 10 * n_sym <= n_words)""".stripMargin
      s"""WITH $gate,
         |${substrOccCtesFor("keptd")},
         |dk AS (SELECT doc_id, pos,
         |         count(*) OVER (PARTITION BY g) AS cnt
         |       FROM occ),
         |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM dk
         |      WHERE cnt > 1),
         |$spanIslandCtes,
         |sp AS (SELECT doc_id, min(s) AS ss, max(e) AS se
         |       FROM g2 GROUP BY doc_id, island),
         |tk AS (SELECT doc_id, i FROM (
         |         SELECT doc_id, unnest(generate_series(1, len(toks))) AS i
         |         FROM t)),
         |kp AS (SELECT doc_id, count(*) AS n_kept FROM tk
         |       WHERE NOT EXISTS (SELECT 1 FROM sp
         |         WHERE sp.doc_id = tk.doc_id
         |           AND sp.ss <= tk.i - 1 AND tk.i - 1 < sp.se)
         |       GROUP BY doc_id),
         |cnt AS (SELECT doc_id, len(toks) AS n FROM t)
         |SELECT c.doc_id,
         |       CAST(c.n AS INTEGER) AS n_tokens,
         |       CAST(c.n - coalesce(kp.n_kept, 0) AS INTEGER) AS n_removed,
         |       CASE WHEN ('0x' || substr(md5(c.doc_id::VARCHAR || 'graft'), 1, 15))::BIGINT
         |                 % 100 < 90 THEN 'train' ELSE 'val' END AS split
         |FROM cnt c LEFT JOIN kp ON c.doc_id = kp.doc_id
         |WHERE coalesce(kp.n_kept, 0) >= 30""".stripMargin
    },

    // Mirrors curateCorpusIngest: gopher gate over the even-train
    // micro-batch slice → min-doc-id keep per canonical md5 → bench
    // gram probe (the frozen-index replay — every batch window whose
    // gram sits in the doc_id%20=0 suite marks) → span removal with
    // reassembly → ≥30-kept-token floor. A fully-removed doc
    // reassembles to NULL n_kept → coalesce 0 → dropped by the floor.
    "curate_corpus_ingest" -> {
      val gate =
        """g0 AS (
          |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
          |  FROM documents WHERE doc_id % 20 <> 0 AND doc_id % 2 = 0),
          |sg AS (SELECT doc_id, text,
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
          |keptd AS MATERIALIZED (
          |  SELECT doc_id, text FROM sg
          |  WHERE n_words >= 50 AND n_words <= 100000
          |    AND sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words
          |    AND 5 * n_alpha >= 4 * n_words
          |    AND n_stop >= 2
          |    AND 10 * n_sym <= n_words)""".stripMargin
      s"""WITH $gate,
         |keep AS (
         |  SELECT min(doc_id) AS doc_id FROM keptd
         |  GROUP BY md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g'))),
         |dd AS MATERIALIZED (
         |  SELECT k.doc_id, k.text FROM keptd k
         |  WHERE EXISTS (SELECT 1 FROM keep WHERE keep.doc_id = k.doc_id)),
         |${substrOccCtesFor("dd")},
         |bt AS (SELECT doc_id, ${wsToks("text")} AS toks
         |       FROM documents WHERE doc_id % 20 = 0),
         |bx AS (SELECT doc_id, toks,
         |         unnest(generate_series(1, len(toks) - 4)) AS i FROM bt),
         |bench AS (SELECT DISTINCT
         |            array_to_string(toks[i : i + 4], ' ') AS g FROM bx),
         |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM occ
         |      WHERE g IN (SELECT g FROM bench)),
         |$spanIslandCtes,
         |sp AS (SELECT doc_id, min(s) AS ss, max(e) AS se
         |       FROM g2 GROUP BY doc_id, island),
         |tk AS (SELECT doc_id, i, toks[i] AS tok FROM (
         |         SELECT doc_id, toks,
         |           unnest(generate_series(1, len(toks))) AS i FROM t)),
         |kept AS (SELECT doc_id, i, tok FROM tk
         |         WHERE NOT EXISTS (SELECT 1 FROM sp
         |           WHERE sp.doc_id = tk.doc_id
         |             AND sp.ss <= tk.i - 1 AND tk.i - 1 < sp.se)),
         |cnt AS (SELECT doc_id, len(toks) AS n FROM t),
         |re AS (SELECT doc_id, count(*) AS n_kept,
         |         string_agg(tok, ' ' ORDER BY i) AS text_clean
         |       FROM kept GROUP BY doc_id)
         |SELECT c.doc_id,
         |       CAST(c.n AS INTEGER) AS n_tokens,
         |       CAST(c.n - coalesce(re.n_kept, 0) AS INTEGER) AS n_removed,
         |       coalesce(re.text_clean, '') AS text_clean
         |FROM cnt c LEFT JOIN re USING (doc_id)
         |WHERE coalesce(re.n_kept, 0) >= 30""".stripMargin
    },

    // Mirrors curateCorpusCommunities: gopher gate → portable minhash
    // bands → verified LSH pairs (lshp) → symmetrized vote graph → 5
    // unrolled synchronous LPA rounds (the graph_communities pattern)
    // → min-doc canonical + member count per community, isolated gated
    // docs as their own 1-member community. Each l_i is MATERIALIZED:
    // it is read twice per level (votes + coalesce), and DuckDB
    // inlines plain CTEs — 2^5 re-expansions of the minhash chain
    // otherwise (the bpeCtes lesson).
    "curate_corpus_communities" -> {
      val gate =
        """g0 AS (
          |  SELECT doc_id, text, list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '') AS toks
          |  FROM documents),
          |sg AS (SELECT doc_id, text,
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
          |keptd AS MATERIALIZED (
          |  SELECT doc_id, text FROM sg
          |  WHERE n_words >= 50 AND n_words <= 100000
          |    AND sum_chars >= 3 * n_words AND sum_chars <= 10 * n_words
          |    AND 5 * n_alpha >= 4 * n_words
          |    AND n_stop >= 2
          |    AND 10 * n_sym <= n_words)""".stripMargin
      val lpa0 =
        """und AS MATERIALIZED (
          |  SELECT id_a AS a, id_b AS b FROM lshp
          |  UNION SELECT id_b, id_a FROM lshp),
          |l0 AS MATERIALIZED (SELECT DISTINCT a AS node, a AS label FROM und)""".stripMargin
      val rounds = (1 to 5).map { i =>
        s"""v$i AS (SELECT u.a AS node, l.label, count(*) AS c
           |  FROM und u JOIN l${i - 1} l ON u.b = l.node GROUP BY 1, 2),
           |w$i AS (SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM v$i)
           |  WHERE rn = 1),
           |l$i AS MATERIALIZED (SELECT p.node, coalesce(w.label, p.label) AS label
           |  FROM l${i - 1} p LEFT JOIN w$i w ON p.node = w.node)""".stripMargin
      }.mkString(",\n")
      s"""WITH $gate,
         |${minhashCtes("keptd")},
         |$lshPairCtes,
         |$lpa0,
         |$rounds
         |SELECT min(node) AS doc_id, label AS community,
         |       count(*) AS n_members
         |FROM l5 GROUP BY label
         |UNION ALL
         |SELECT doc_id, doc_id, CAST(1 AS BIGINT)
         |FROM keptd WHERE doc_id NOT IN (SELECT node FROM l5)""".stripMargin
    },

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
        |  FROM cleaned)""".stripMargin
  )
}
