package graft

import graft.OracleCtes._

/** DuckDB twins for the [[TextQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object TextOracles {
  /** ONE definition for the PII-density report's replay, bound to
    * both the one-shot and the saved-state catalog queries: by the
    * counted-fold identity they must equal bit-for-bit, and sharing
    * the val makes silent divergence of the copies impossible. */
  private val piiDensitySql: String =
    """WITH s0 AS (SELECT doc_id, source, text AS t0,
      |         CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS BIGINT) AS nt
      |       FROM documents),
      |s1 AS (SELECT *, regexp_replace(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g') AS t1 FROM s0),
      |s2 AS (SELECT *, regexp_replace(t1, '\b\d{1,3}(\.\d{1,3}){3}\b', '<IP>', 'g') AS t2 FROM s1),
      |p AS (SELECT source, nt,
      |        CAST(len(regexp_extract_all(t0, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
      |           + len(regexp_extract_all(t1, '\b\d{1,3}(\.\d{1,3}){3}\b'))
      |           + len(regexp_extract_all(t2, '\d{7,}')) AS BIGINT) AS pii
      |      FROM s2)
      |SELECT source, count(*) AS n_docs,
      |       CAST(sum(nt) AS BIGINT) AS n_tokens,
      |       CAST(sum(pii) AS BIGINT) AS n_pii,
      |       CASE WHEN sum(nt) > 0
      |            THEN round(sum(pii) * 10000.0 / sum(nt)) / 10000
      |            ELSE 0 END AS pii_share
      |FROM p GROUP BY source""".stripMargin

  val map: Map[String, String] = Map(
    // Mirrors textFingerprint: winnow(k=8, w=4) summary stats.
    "text_fingerprint" ->
      s"""WITH ${winnowCtes(8, 4)}
         |SELECT doc_id, len(fps)::INTEGER AS n_fingerprints,
         |       list_min(fps) AS min_fp, list_max(fps) AS max_fp
         |FROM m""".stripMargin,

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
        |  SELECT doc_id, lang, n_tokens,
        |         CASE WHEN n_tokens > 0 THEN round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) / 10000 END AS stop_ratio,
        |         CASE WHEN n_tokens > 0 THEN round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) / 10000 END AS mean_token_len
        |  FROM sig),
        |q AS (
        |  SELECT *, CASE WHEN n_tokens > 0 THEN least(300000, greatest(0,
        |           50 * CAST(round(stop_ratio * 10000) AS BIGINT) + 150000
        |           - 3 * abs(CAST(round(mean_token_len * 10000) AS BIGINT) - 50000)))
        |           ELSE 0 END AS q30
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
        |         CASE WHEN n_tokens > 0 THEN round(CAST(n_stopwords * 10000 AS DOUBLE) / n_tokens) / 10000 END AS stop_ratio,
        |         CASE WHEN n_chars_raw > 0 THEN round(CAST((n_chars_raw - n_nopunct) * 10000 AS DOUBLE) / n_chars_raw) / 10000 END AS punct_ratio,
        |         CASE WHEN n_tokens > 0 THEN round(CAST(sum_tok_chars * 10000 AS DOUBLE) / n_tokens) / 10000 END AS mean_token_len
        |  FROM sig),
        |q AS (
        |  SELECT *, CASE WHEN n_tokens > 0 THEN least(300000, greatest(0,
        |           50 * CAST(round(stop_ratio * 10000) AS BIGINT) + 150000
        |           - 3 * abs(CAST(round(mean_token_len * 10000) AS BIGINT) - 50000)))
        |           ELSE 0 END AS q30
        |  FROM r)
        |SELECT doc_id, n_tokens, n_stopwords, stop_ratio, punct_ratio, mean_token_len,
        |       CAST((q30 + 15) // 30 AS DOUBLE) / 10000 AS quality_score
        |FROM q""".stripMargin,

    "text_langid" ->
      """WITH t AS (
        |  SELECT doc_id,
        |         list_filter(regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
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

    // Mirrors TextOps.bm25TopK('data','vector','merge', k=50): the
    // Okapi rationals multiplied through so idf and tfpart are each
    // ONE IEEE division of exact integers, per-term scores scaled to
    // 4-dp integers BEFORE the per-doc sum (order-independent), the
    // top-50 cut on the exact integer sum with the doc-id tiebreak.
    "text_bm25" ->
      """WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
        |         lower(text), '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS toks
        |       FROM documents),
        |d AS (SELECT doc_id, CAST(len(toks) AS BIGINT) AS dl FROM t),
        |tot AS (SELECT CAST(sum(dl) AS BIGINT) AS total_len,
        |               CAST(count(*) AS BIGINT) AS n_docs FROM d),
        |occ AS (SELECT doc_id, unnest(toks) AS w FROM t),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS tf FROM occ
        |       WHERE w IN ('data', 'vector', 'merge') GROUP BY 1, 2),
        |dfq AS (SELECT w, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
        |sc AS (SELECT tf.doc_id,
        |         CAST(round(
        |           ((2 * n_docs - 2 * df + 1)::DOUBLE / (2 * df + 1)::DOUBLE)
        |           * ((44 * tf * total_len)::DOUBLE /
        |              (20 * tf * total_len + 6 * total_len
        |               + 18 * dl * n_docs)::DOUBLE)
        |           * 10000) AS BIGINT) AS scaled
        |       FROM tf JOIN dfq USING (w) JOIN d USING (doc_id) CROSS JOIN tot),
        |agg AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n_terms,
        |               CAST(sum(scaled) AS BIGINT) AS s
        |        FROM sc GROUP BY 1)
        |SELECT doc_id, n_terms, s::DOUBLE / 10000 AS score
        |FROM agg ORDER BY s DESC, doc_id ASC LIMIT 50""".stripMargin,

    // Mirrors textBoilerplateIndexed: the gram-df table trained on
    // the doc_id%3=0 reference slice at floor 3, every doc screened
    // against that static boilerplate set (LEFT JOIN + null = novel).
    "text_boilerplate_indexed" ->
      s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) AS s
        |       FROM w WHERE len(toks) >= 3),
        |ex AS (SELECT doc_id, unnest(s) AS g FROM sh),
        |boiler AS (SELECT g FROM ex WHERE doc_id % 3 = 0
        |           GROUP BY 1 HAVING count(*) >= 3),
        |per AS (SELECT doc_id, count(*) AS n_grams,
        |          CAST(sum(CASE WHEN b.g IS NOT NULL THEN 1 ELSE 0 END)
        |            AS BIGINT) AS n_boiler
        |        FROM ex LEFT JOIN boiler b ON ex.g = b.g GROUP BY 1)
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

    // Mirrors Packing.lengthBuckets: smallest power-of-2 bucket ≥
    // n_tokens via binary-string length (DuckDB bin ≡ Spark
    // conv(_,10,2), no leading zeros — the portable-HLL discipline).
    "pack_length_buckets" ->
      """WITH t AS (
        |  SELECT CAST(len(list_filter(regexp_split_to_array(text, '[ \t\n\x0b\f\r]+'), t -> t <> '')) AS BIGINT) AS n
        |  FROM documents),
        |b AS (
        |  SELECT n, greatest(16,
        |    CASE WHEN n <= 1 THEN 1
        |         ELSE (1::BIGINT << length(bin(n - 1))) END) AS bucket
        |  FROM t)
        |SELECT bucket, count(*) AS n_docs,
        |       CAST(sum(n) AS BIGINT) AS n_tokens,
        |       CAST(bucket * count(*) AS BIGINT) AS capacity,
        |       CAST(bucket * count(*) - sum(n) AS BIGINT) AS padding_waste,
        |       round(sum(n) * 10000.0 / (bucket * count(*))) / 10000
        |         AS fill_ratio
        |FROM b GROUP BY bucket""".stripMargin,

    // Mirrors packUtilization: the same corpus packed in arrival vs
    // tokens-desc (NFD) order, rolled into per-source utilization.
    "pack_utilization" -> {
      def form(orderSql: String, label: String) =
        s"""SELECT source, count(*) AS n_packs,
           |       CAST(sum(pack_tokens) AS BIGINT) AS total_tokens,
           |       CAST(sum(CASE WHEN pack_tokens > 512 THEN 1 ELSE 0 END) AS BIGINT) AS n_overflow,
           |       CAST(min(pack_tokens) AS BIGINT) AS min_fill,
           |       CAST(max(pack_tokens) AS BIGINT) AS max_fill,
           |       count(*) * 512 AS capacity,
           |       round(sum(pack_tokens) * 10000.0 / (count(*) * 512)) / 10000 AS util_ratio,
           |       '$label' AS order_form
           |FROM (
           |  SELECT source, pack_id, CAST(sum(n_tokens) AS BIGINT) AS pack_tokens
           |  FROM (
           |    SELECT source, CAST(floor((cum - n_tokens) / 512.0) AS BIGINT) AS pack_id,
           |           n_tokens
           |    FROM (SELECT *, sum(n_tokens) OVER (
           |            PARTITION BY source ORDER BY $orderSql
           |            ROWS UNBOUNDED PRECEDING) AS cum FROM t))
           |  GROUP BY 1, 2)
           |GROUP BY source""".stripMargin
      s"""WITH t AS (
         |  SELECT doc_id, source,
         |         CAST(len(list_filter(regexp_split_to_array(text, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '')) AS BIGINT) AS n_tokens
         |  FROM documents)
         |${form("doc_id", "arrival")}
         |UNION ALL
         |${form("n_tokens DESC, doc_id", "nfd")}""".stripMargin
    },

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

    // Mirrors TextOps.vocabTopK (regex tokens, lowercased): wordcount
    // top-100 with the token-string tiebreak making the set exact.
    "vocab_topk" ->
      """SELECT token, count(*) AS n
        |FROM (
        |  SELECT unnest(list_filter(
        |           regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
        |           x -> len(x) > 0)) AS token
        |  FROM documents)
        |GROUP BY 1
        |ORDER BY n DESC, token ASC
        |LIMIT 100""".stripMargin,

    // Mirrors TextOps.topCollocations: the word2vec phrase score
    // (c_xy−5)·N/(c_x·c_y) over the regex-token bigrams, c_xy ≥ 5,
    // one mirrored IEEE division, (score desc, w1, w2) total order.
    "vocab_collocations" ->
      raw"""WITH t AS (SELECT doc_id, list_filter(regexp_split_to_array(
        |    lower(text), '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS tk
        |  FROM documents),
        |uni AS (SELECT w, CAST(count(*) AS BIGINT) AS c
        |        FROM (SELECT unnest(tk) AS w FROM t) GROUP BY 1),
        |n AS (SELECT CAST(sum(c) AS BIGINT) AS n_tokens FROM uni),
        |bg AS (SELECT z[1] AS w1, z[2] AS w2,
        |         CAST(count(*) AS BIGINT) AS c_xy
        |       FROM (SELECT unnest(list_zip(tk[:-2], tk[2:])) AS z FROM t)
        |       GROUP BY 1, 2 HAVING count(*) >= 5)
        |SELECT w1, w2, c_xy, cx.c AS c_x, cy.c AS c_y,
        |       round(CAST(c_xy - 5 AS DOUBLE) * n_tokens
        |             / (cx.c * cy.c) * 10000) / 10000 AS score
        |FROM bg JOIN uni cx ON bg.w1 = cx.w
        |JOIN uni cy ON bg.w2 = cy.w CROSS JOIN n
        |ORDER BY score DESC, w1, w2 LIMIT 50""".stripMargin,

    // Mirrors TextOps.vocabOverlap: distinct (source, token), token-
    // keyed self-join, Jaccard with integer-scaled rounding.
    "source_overlap" ->
      """WITH gt AS (
        |  SELECT DISTINCT source AS g, token FROM (
        |    SELECT source,
        |           unnest(list_filter(
        |             regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
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
        |             regexp_split_to_array(lower(text), '[^\p{L}\p{N}]+'),
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

    // Per-source rollup of text_redact's staged PII count (email on
    // the raw text, IP after the email pass, long-number after the IP
    // pass — the same replacement-stage semantics) over the whitespace
    // token denominator; pii_share is the 4-dp integer-scaled ratio.
    "report_pii_density" -> piiDensitySql,

    // The incremental form folds per-source counted partials per
    // batch and reports from state alone; by the counted-fold
    // identity (sums of per-batch sums) it must equal the full-corpus
    // replay bit-for-bit — the SAME SQL, by construction (shared val).
    "report_pii_density_incremental" -> piiDensitySql,

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
        |       CASE WHEN n_words > 0 THEN round(CAST(sum_chars * 10000 AS DOUBLE) / n_words) / 10000 END
        |         AS mean_word_len,
        |       CASE WHEN n_words > 0 THEN round(CAST(n_alpha * 10000 AS DOUBLE) / n_words) / 10000 END
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

    // Mirrors TextOps.entropySignals: dyadic unigram entropy
    // sum_bits = N·⌊log2 N⌋ − Σ c·⌊log2 c⌋ with ⌊log2 x⌋ =
    // length(bin(x)) − 1 — exact BIGINTs; entropy is the one mirrored
    // IEEE division, the gate compares the integers.
    "quality_entropy" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |           '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS re
        |  FROM documents),
        |tf AS (SELECT doc_id, w, CAST(count(*) AS BIGINT) AS c
        |       FROM (SELECT doc_id, unnest(re) AS w FROM toks)
        |       GROUP BY 1, 2),
        |agg AS (SELECT doc_id,
        |          CAST(sum(c) AS BIGINT) AS n_tokens,
        |          CAST(count(*) AS BIGINT) AS n_distinct,
        |          CAST(sum(c * (length(bin(c)) - 1)) AS BIGINT) AS cb
        |        FROM tf GROUP BY 1)
        |SELECT doc_id, n_tokens, n_distinct,
        |       n_tokens * (length(bin(n_tokens)) - 1) - cb AS sum_bits,
        |       CAST(n_tokens * (length(bin(n_tokens)) - 1) - cb AS DOUBLE)
        |         / n_tokens AS entropy,
        |       (n_tokens * (length(bin(n_tokens)) - 1) - cb) < n_tokens
        |         AS low_entropy
        |FROM agg""".stripMargin,

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

    // Mirrors TextOps.scrubRareTokens: whole-corpus token counts,
    // tokens under the floor mask to <unk>, reassembly ORDER BY
    // position ↔ the array_sort(collect_list(struct)) join; the doc
    // spine's left join gives token-free docs their (0, 0, '') row.
    "text_scrub_rare" ->
      s"""WITH t AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
         |ex AS (SELECT doc_id, i, toks[i] AS tok
         |       FROM (SELECT doc_id, toks,
         |               unnest(generate_series(1, len(toks))) AS i FROM t)),
         |v AS (SELECT tok, count(*) AS c FROM ex GROUP BY 1),
         |m AS (SELECT doc_id, i,
         |        CASE WHEN c < 3 THEN 1 ELSE 0 END AS rare,
         |        CASE WHEN c < 3 THEN '<unk>' ELSE tok END AS tok2
         |      FROM ex JOIN v USING (tok)),
         |re AS (SELECT doc_id, count(*) AS n_tokens,
         |         CAST(sum(rare) AS BIGINT) AS n_scrubbed,
         |         string_agg(tok2, ' ' ORDER BY i) AS text_scrubbed
         |       FROM m GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(coalesce(n_tokens, 0) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(n_scrubbed, 0) AS BIGINT) AS n_scrubbed,
         |       coalesce(text_scrubbed, '') AS text_scrubbed
         |FROM documents d LEFT JOIN re USING (doc_id)""".stripMargin,

    // Mirrors textDedupLines over the shared multi-line fixture
    // ([text, first-40, text, footer] joined by \n): per doc, each
    // line keeps its first occurrence, order preserved.
    "text_dedup_lines" ->
      """WITH w AS (SELECT doc_id,
        |    text || chr(10) || substr(text, 1, 40) || chr(10) || text
        |         || chr(10) || 'all rights reserved footer' AS t
        |  FROM documents),
        |b AS (SELECT doc_id, str_split(t, chr(10)) AS l FROM w),
        |ex AS (SELECT doc_id, i - 1 AS pos, l[i] AS line
        |       FROM (SELECT doc_id, l,
        |               unnest(generate_series(1, len(l))) AS i FROM b)),
        |fo AS (SELECT doc_id, line, min(pos) AS pos FROM ex GROUP BY 1, 2),
        |per AS (SELECT doc_id, count(*) AS n_kept,
        |          string_agg(line, chr(10) ORDER BY pos) AS text_deduped
        |        FROM fo GROUP BY 1),
        |tot AS (SELECT doc_id, count(*) AS n_lines FROM ex GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
        |       CAST(coalesce(n_kept, 0) AS BIGINT) AS n_kept,
        |       coalesce(text_deduped, '') AS text_deduped
        |FROM documents d LEFT JOIN tot USING (doc_id)
        |LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors textStripLines: global line document-frequency (distinct
    // per doc) >= 5 strikes the line from every doc.
    "text_strip_lines" ->
      """WITH w AS (SELECT doc_id,
        |    text || chr(10) || substr(text, 1, 40) || chr(10) || text
        |         || chr(10) || 'all rights reserved footer' AS t
        |  FROM documents),
        |b AS (SELECT doc_id, str_split(t, chr(10)) AS l FROM w),
        |ex AS (SELECT doc_id, i - 1 AS pos, l[i] AS line
        |       FROM (SELECT doc_id, l,
        |               unnest(generate_series(1, len(l))) AS i FROM b)),
        |ldf AS (SELECT line FROM (SELECT DISTINCT doc_id, line FROM ex)
        |        GROUP BY line HAVING count(*) >= 5),
        |m AS (SELECT e.doc_id, e.pos, e.line,
        |        CASE WHEN ldf.line IS NOT NULL THEN 1 ELSE 0 END AS boiler
        |      FROM ex e LEFT JOIN ldf ON e.line = ldf.line),
        |per AS (SELECT doc_id, count(*) AS n_lines,
        |          CAST(sum(boiler) AS BIGINT) AS n_stripped,
        |          coalesce(string_agg(CASE WHEN boiler = 0 THEN line END,
        |            chr(10) ORDER BY pos), '') AS text_clean
        |        FROM m GROUP BY 1)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_lines, 0) AS BIGINT) AS n_lines,
        |       CAST(coalesce(n_stripped, 0) AS BIGINT) AS n_stripped,
        |       coalesce(text_clean, '') AS text_clean
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors TextOps.screenSurprisal over TextOps.lmIndex trained on
    // the doc_id%3 slice: the LM (c_bg ‖ c_prefix, pre-joined like the
    // index frame) LEFT-joins the occurrence stream, unknown bigrams
    // count as n_oov, and the ratios divide by the SCORED count.
    "quality_lm_indexed" ->
      """WITH toks AS (
        |  SELECT doc_id, list_filter(regexp_split_to_array(lower(text),
        |           '[^\p{L}\p{N}]+'), x -> len(x) > 0) AS t
        |  FROM documents),
        |bg AS (
        |  SELECT doc_id, z[1] AS w1, z[2] AS w2 FROM (
        |    SELECT doc_id, unnest(list_zip(t[:-2], t[2:])) AS z FROM toks)),
        |lm AS (SELECT w1, w2, count(*) AS c_bg FROM bg
        |       WHERE doc_id % 3 = 0 GROUP BY 1, 2),
        |lmx AS (SELECT w1, w2, c_bg, c_prefix FROM lm JOIN
        |          (SELECT w1, CAST(sum(c_bg) AS BIGINT) AS c_prefix
        |           FROM lm GROUP BY 1) USING (w1)),
        |occ AS (
        |  SELECT doc_id, c_bg,
        |         CASE WHEN c_bg IS NOT NULL
        |              THEN length(bin(c_prefix // c_bg)) - 1 ELSE 0 END AS bits,
        |         CASE WHEN c_bg IS NOT NULL AND c_bg <= 2
        |              THEN 1 ELSE 0 END AS rare
        |  FROM bg LEFT JOIN lmx USING (w1, w2)),
        |per AS (
        |  SELECT doc_id, count(*) AS n_bigrams,
        |         CAST(sum(CASE WHEN c_bg IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
        |         CAST(sum(CASE WHEN c_bg IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |         CAST(sum(bits) AS BIGINT) AS sum_bits,
        |         CAST(sum(rare) AS BIGINT) AS n_rare
        |  FROM occ GROUP BY 1)
        |SELECT doc_id,
        |       CAST(coalesce(n_bigrams, 0) AS BIGINT) AS n_bigrams,
        |       CAST(coalesce(n_scored, 0) AS BIGINT) AS n_scored,
        |       CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
        |       CAST(coalesce(sum_bits, 0) AS BIGINT) AS sum_bits,
        |       CAST(coalesce(n_rare, 0) AS BIGINT) AS n_rare,
        |       CASE WHEN coalesce(n_scored, 0) > 0
        |         THEN round(sum_bits * 10000.0 / n_scored) / 10000
        |       END AS bits_per_bigram,
        |       CASE WHEN coalesce(n_scored, 0) > 0
        |         THEN round(n_rare * 10000.0 / n_scored) / 10000
        |       END AS rare_ratio
        |FROM documents LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors TextOps.qualityClassifierIndex + screenQualityClassifier
    // (train slice doc_id%3, label lang='en', buckets 2^18): distinct
    // hashed {1,2}-gram presence features (md5 % P % B — bit-identical
    // to the JVM HashedWordShingles/pmod pair), NB log-count-ratio
    // weights in floor-log2 bit-space, per-doc score = Σ weights of
    // present features, OOV buckets honest and zero-weighted.
    "quality_classifier" -> {
      val b = 1 << 18
      s"""WITH w AS (SELECT doc_id, lang, ${wsToks("text")} AS toks
        |           FROM documents),
        |feats AS (SELECT doc_id, lang, list_distinct(
        |    [ (md5_number_lower(toks[i])
        |         % $pSql::UBIGINT)::BIGINT % $b
        |      for i in generate_series(1, len(toks)) ]
        |    || [ (md5_number_lower(toks[i] || ' ' || toks[i+1])
        |            % $pSql::UBIGINT)::BIGINT % $b
        |         for i in generate_series(1, len(toks) - 1) ]) AS fs
        |  FROM w),
        |tr AS (SELECT doc_id, lang = 'en' AS pos, fs FROM feats
        |       WHERE doc_id % 3 = 0),
        |trex AS (SELECT pos, unnest(fs) AS g FROM tr),
        |dfc AS (SELECT g,
        |          CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS df_pos,
        |          CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS df_neg
        |        FROM trex GROUP BY 1),
        |tot AS (SELECT CAST(sum(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
        |               CAST(sum(CASE WHEN NOT pos THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
        |        FROM tr),
        |wts AS (SELECT g,
        |          ((length(bin(df_pos + 1)) - 1) - (length(bin(n_pos + 1)) - 1))
        |          - ((length(bin(df_neg + 1)) - 1) - (length(bin(n_neg + 1)) - 1)) AS w
        |        FROM dfc CROSS JOIN tot),
        |ex AS (SELECT doc_id, unnest(fs) AS g FROM feats WHERE len(fs) > 0),
        |per AS (SELECT doc_id, count(*) AS n_feats,
        |          CAST(sum(CASE WHEN w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_scored,
        |          CAST(sum(CASE WHEN w IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
        |          CAST(sum(coalesce(w, 0)) AS BIGINT) AS score
        |        FROM ex LEFT JOIN wts USING (g) GROUP BY 1),
        |posex AS (SELECT doc_id, unnest(fs) AS g FROM tr
        |          WHERE pos AND len(fs) > 0),
        |posper AS (SELECT doc_id, count(*) AS n_feats,
        |             CAST(sum(coalesce(w, 0)) AS BIGINT) AS score
        |           FROM posex LEFT JOIN wts USING (g) GROUP BY 1),
        |posn AS (SELECT (score * 1000
        |                 - ((score * 1000 % n_feats) + n_feats) % n_feats)
        |                // n_feats AS norm FROM posper),
        |thr AS (SELECT quantile_cont(norm, 0.1) AS t FROM posn)
        |SELECT d.doc_id,
        |       CAST(coalesce(n_feats, 0) AS BIGINT) AS n_feats,
        |       CAST(coalesce(n_scored, 0) AS BIGINT) AS n_scored,
        |       CAST(coalesce(n_oov, 0) AS BIGINT) AS n_oov,
        |       CAST(coalesce(score, 0) AS BIGINT) AS score,
        |       CAST(CASE WHEN n_feats > 0 THEN
        |         (score * 1000 - ((score * 1000 % n_feats) + n_feats) % n_feats)
        |           // n_feats END AS BIGINT) AS norm_score,
        |       coalesce(CASE WHEN n_feats > 0 THEN
        |         (score * 1000 - ((score * 1000 % n_feats) + n_feats) % n_feats)
        |           // n_feats END >= (SELECT t FROM thr), false) AS keep
        |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin
    },

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
        |         THEN round(weight_bits * 10000.0 / n_scored) / 10000 + 0.0
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
        |         THEN round(weight_bits * 10000.0 / n_scored) / 10000 + 0.0
        |       END AS mean_weight
        |FROM documents LEFT JOIN per USING (doc_id)""".stripMargin,

    // Mirrors Unigram.trainModel(seed 60, vocab 40): the full hard-EM
    // walk replayed — seed substring counts, count·length seed rank,
    // floor-log2 costs, unrolled Viterbi E-step, prune, final costs.
    "vocab_unigram" ->
      s"""WITH ${unigramCtes(60, 40, 4, 16)}
         |SELECT piece, cnt AS count, cost AS cost_bits FROM upc1""".stripMargin,

    // Mirrors Unigram.segment under the trained model: the second
    // Viterbi pass's final dp rows, word for word.
    "vocab_unigram_segment" ->
      s"""WITH ${unigramCtes(60, 40, 4, 16)}
         |SELECT word, freq, seg,
         |       CAST(len(string_split(seg, '~')) AS INTEGER) AS n_tokens
         |FROM useg""".stripMargin,

    // Mirrors reportUnigramFertility: per-lang occurrence stream
    // joined to the unigram token price; each ratio one mirrored
    // IEEE division over exact integer sums (the BPE report shape).
    "report_unigram_fertility" ->
      s"""WITH ${unigramCtes(60, 40, 4, 16)},
         |useg_n AS (SELECT word,
         |             CAST(len(string_split(seg, '~')) AS BIGINT) AS n_tok
         |           FROM useg),
         |occ AS (SELECT lang, unnest(list_filter(regexp_split_to_array(
         |          lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)) AS word
         |        FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |       CAST(sum(n_tok) AS BIGINT) AS n_uni_tokens,
         |       round(CAST(sum(n_tok) * 10000 AS DOUBLE) / count(*)) / 10000
         |         AS fertility,
         |       round(CAST(sum(len(word)) * 10000 AS DOUBLE) / sum(n_tok)) / 10000
         |         AS chars_per_token
         |FROM occ JOIN useg_n USING (word) GROUP BY 1""".stripMargin,

    // Mirrors reportTokenizerCompare: ALL THREE tokenizer replays (the
    // BPE stage chain, the unigram EM chain, the WordPiece likelihood
    // chain + greedy unroll — disjoint CTE namespaces) joined to one
    // occurrence stream, per-lang roll-up.
    "report_tokenizer_compare" ->
      s"""WITH ${bpeCtes(8)},
         |${unigramCtes(60, 40, 4, 16)},
         |${wordpieceCtes(8)},
         |${wordpieceSegCtes(8)},
         |bseg AS (SELECT word,
         |           CAST(len(string_split(symbols, '~')) AS BIGINT) AS n_bpe
         |         FROM w8),
         |useg_n AS (SELECT word,
         |             CAST(len(string_split(seg, '~')) AS BIGINT) AS n_uni
         |           FROM useg),
         |wseg_n AS (SELECT word, CAST(n_tokens AS BIGINT) AS n_wp FROM wpseg),
         |occ AS (SELECT lang, unnest(list_filter(regexp_split_to_array(
         |          lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)) AS word
         |        FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(n_bpe) AS BIGINT) AS n_bpe_tokens,
         |       CAST(sum(n_uni) AS BIGINT) AS n_uni_tokens,
         |       CAST(sum(n_wp) AS BIGINT) AS n_wp_tokens,
         |       round(CAST(sum(n_bpe) * 10000 AS DOUBLE) / count(*)) / 10000
         |         AS bpe_fertility,
         |       round(CAST(sum(n_uni) * 10000 AS DOUBLE) / count(*)) / 10000
         |         AS uni_fertility,
         |       round(CAST(sum(n_wp) * 10000 AS DOUBLE) / count(*)) / 10000
         |         AS wp_fertility
         |FROM occ JOIN bseg USING (word) JOIN useg_n USING (word)
         |         JOIN wseg_n USING (word)
         |GROUP BY 1""".stripMargin,

    // Mirrors aggHeavyHitters: the two-pass sketch's output is exact
    // by design, so the twin is a plain GROUP BY with the same
    // cnt·(k+1) > n integer cross-multiplication threshold.
    "agg_heavy_hitters" ->
      s"""WITH toks AS (SELECT unnest(list_filter(regexp_split_to_array(
         |         lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)) AS word
         |       FROM documents),
         |n AS (SELECT CAST(count(*) AS BIGINT) AS n FROM toks)
         |SELECT word, CAST(count(*) AS BIGINT) AS cnt,
         |       round(count(*) * 10000.0 / (SELECT n FROM n)) / 10000 AS share
         |FROM toks GROUP BY word
         |HAVING count(*) * 31 > (SELECT n FROM n)""".stripMargin,

    // Mirrors WordPiece.trainMerges(nMerges = 8): each stage's winning
    // pair under the quantized likelihood key becomes one merge row; a
    // pair-exhausted stage emits nothing.
    "vocab_wordpiece" ->
      s"""WITH ${wordpieceCtes(8)}
         |${(1 to 8).map(i =>
              s"SELECT CAST($i AS INTEGER) AS step, l AS lhs, r AS rhs, " +
              s"l || r AS merged, score_key, cnt AS pair_count FROM wpb$i")
            .mkString("\nUNION ALL\n")}""".stripMargin,

    // Mirrors WordPiece.segment with the model trained on the same
    // corpus: the greedy longest-match unroll's final relation.
    "vocab_wordpiece_segment" ->
      s"""WITH ${wordpieceCtes(8)},
         |${wordpieceSegCtes(8)}
         |SELECT word, freq, seg, n_tokens FROM wpseg""".stripMargin,

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

    // Mirrors reportBpeFertility: same 8-stage BPE replay as
    // vocab_bpe_shared, words joined to their token price, rolled up
    // per lang; each ratio is one mirrored IEEE division over exact
    // integer sums.
    "report_bpe_fertility" ->
      s"""WITH ${bpeCtes(8)},
         |seg AS (SELECT word,
         |          CAST(len(string_split(symbols, '~')) AS BIGINT) AS n_tok
         |        FROM w8),
         |occ AS (SELECT lang, unnest(list_filter(regexp_split_to_array(
         |          lower(text), '[^\\p{L}\\p{N}]+'), x -> len(x) > 0)) AS word
         |        FROM documents)
         |SELECT lang, CAST(count(*) AS BIGINT) AS n_words,
         |       CAST(sum(len(word)) AS BIGINT) AS n_chars,
         |       CAST(sum(n_tok) AS BIGINT) AS n_bpe_tokens,
         |       round(CAST(sum(n_tok) * 10000 AS DOUBLE) / count(*)) / 10000
         |         AS fertility,
         |       round(CAST(sum(len(word)) * 10000 AS DOUBLE) / sum(n_tok)) / 10000
         |         AS chars_per_token
         |FROM occ JOIN seg USING (word) GROUP BY 1""".stripMargin,

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

    // Mirrors TrainingOrder.interleaveBySource (salt 'graft', epoch 0):
    // md5 rank within each source, alphabetical source index, position
    // = rank·S + idx.
    "layout_interleave" ->
      """WITH r AS (
        |  SELECT doc_id, source,
        |         CAST(row_number() OVER (PARTITION BY source
        |           ORDER BY md5(doc_id::VARCHAR || 'graft:0'), doc_id)
        |           AS BIGINT) - 1 AS src_rank
        |  FROM documents),
        |s AS (SELECT source,
        |        CAST(row_number() OVER (ORDER BY source) AS BIGINT) - 1 AS sidx,
        |        CAST(count(*) OVER () AS BIGINT) AS n
        |      FROM (SELECT DISTINCT source FROM documents))
        |SELECT doc_id, r.source, src_rank,
        |       CAST(sidx AS INTEGER) AS source_idx,
        |       src_rank * n + sidx AS interleave_pos
        |FROM r JOIN s ON r.source = s.source""".stripMargin,

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
