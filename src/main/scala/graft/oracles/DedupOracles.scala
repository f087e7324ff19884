package graft

import graft.OracleCtes._

/** DuckDB twins for the [[DedupQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object DedupOracles {
  /** ONE definition for the incremental screen's replay, bound to both
    * the in-memory-index and the bucketed-saved-index catalog queries:
    * the two engines MUST be checked against the same SQL — sharing
    * the val makes silent divergence of the copies impossible. */
  private val incrementalCoverageSql: String =
    s"""WITH $substrOccCtes,
       |k AS (SELECT doc_id, pos,
       |        count(*) OVER (PARTITION BY g) AS cnt
       |      FROM occ),
       |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM k
       |      WHERE cnt > 1 AND doc_id % 10 = 7),
       |$spanIslandCtes
       |$spanSelectSql""".stripMargin

  /** ONE definition for the incremental near-dup screen's replay,
    * bound to both the in-memory-index and the saved-state catalog
    * queries (same sharing discipline as [[incrementalCoverageSql]]). */
  private lazy val incrementalNearSql: String =
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
       |  AND NOT EXISTS (SELECT 1 FROM dup WHERE dup.in_doc = d.doc_id)""".stripMargin

  /** ONE definition for the incremental SEMANTIC screen's replay,
    * bound to both the in-memory and the saved-state catalog queries
    * (same sharing discipline as [[incrementalNearSql]]). Mirrors
    * SemDedup.newAgainstReferenceSemantic end to end: centers = the
    * even-id reference's 16 smallest-md5 vectors (the dedup_semantic
    * draw), both sides argmax-assign in the rounded 4-dp integer
    * cosine space with ties to the smallest center id, and an odd-id
    * vector drops when any SAME-CLUSTER reference vector clears 0.4
    * at 4-dp cosine. */
  private lazy val incrementalSemanticSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
      |r AS (SELECT vec_id, v FROM e WHERE vec_id % 2 = 0),
      |i AS (SELECT vec_id, v FROM e WHERE vec_id % 2 <> 0),
      |c AS (SELECT vec_id AS center_id, v AS cv FROM r
      |      ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
      |ra AS (SELECT vec_id, v, center_id AS cluster FROM (
      |    SELECT r.vec_id, r.v, c.center_id,
      |      row_number() OVER (PARTITION BY r.vec_id ORDER BY
      |        round(list_dot_product(r.v, c.cv) /
      |          (sqrt(list_dot_product(r.v, r.v)) * sqrt(list_dot_product(c.cv, c.cv))) * 10000) DESC,
      |        c.center_id) AS rk
      |    FROM r CROSS JOIN c) WHERE rk = 1),
      |ia AS (SELECT vec_id, v, center_id AS cluster FROM (
      |    SELECT i.vec_id, i.v, c.center_id,
      |      row_number() OVER (PARTITION BY i.vec_id ORDER BY
      |        round(list_dot_product(i.v, c.cv) /
      |          (sqrt(list_dot_product(i.v, i.v)) * sqrt(list_dot_product(c.cv, c.cv))) * 10000) DESC,
      |        c.center_id) AS rk
      |    FROM i CROSS JOIN c) WHERE rk = 1),
      |dup AS (SELECT DISTINCT ia.vec_id FROM ia JOIN ra ON ia.cluster = ra.cluster
      |        WHERE round(list_dot_product(ia.v, ra.v) /
      |          (sqrt(list_dot_product(ia.v, ia.v)) * sqrt(list_dot_product(ra.v, ra.v))) * 10000) / 10000 >= 0.4)
      |SELECT vec_id, cluster FROM ia
      |WHERE NOT EXISTS (SELECT 1 FROM dup WHERE dup.vec_id = ia.vec_id)""".stripMargin

  val map: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS text_hash,
        |       min(doc_id) AS keep_id, count(*) AS dup_count
        |FROM documents GROUP BY 1""".stripMargin,

    // Mirrors ngramJaccardPairs including the maxDocFreq=50 hot-shingle
    // cap: shingles in >50 docs are dropped BEFORE the self-join, and
    // Jaccard uses the retained set sizes.
    "dedup_ngram" -> dedupNgramSql,

    // Oracle for prefixFilterPairs: the EXHAUSTIVE uncapped shingle
    // join — no prefix machinery on purpose. The prefix theorem says
    // the engine's pruned candidate set loses no qualifying pair, so
    // its output must equal this plain relation; any false negative
    // the prefix/length stages introduced would hash-mismatch here.
    "dedup_prefix_join" ->
      s"""WITH w AS (SELECT doc_id, ${wsToks("text")} AS toks FROM documents),
         |sh AS (SELECT doc_id,
         |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
         |                        for i in generate_series(1, len(toks) - 2)]) AS s
         |       FROM w WHERE len(toks) >= 3),
         |ex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
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
         |WHERE round(CAST(n_inter * 10000 AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter)) / 10000 >= 0.5""".stripMargin,

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

    // Mirrors Dedup.exactSubstrSpans (ExactSubstr, Lee et al. 2022) —
    // see OracleCtes.exactSubstrCtes/spanIslandCtes for replay notes.
    "dedup_substring" ->
      s"""WITH $exactSubstrCtes
         |$spanSelectSql""".stripMargin,

    // Mirrors Dedup.exactSubstrApply over the SAME span CTEs — see
    // OracleCtes.spanApplySql.
    "dedup_substring_apply" ->
      s"""WITH $exactSubstrCtes,
         |${spanApplySql("", "text_dedup")}""".stripMargin,

    // Cross-algorithm twin of SuffixDedup.duplicatedSpans (prefix-
    // doubling suffix ranks on the engine side): the all-occurrence
    // gram-coverage replay — see OracleCtes.exactSubstrAllCtes.
    "dedup_substring_exact" ->
      s"""WITH $exactSubstrAllCtes
         |$spanSelectSql""".stripMargin,

    "dedup_substring_exact_apply" ->
      s"""WITH $exactSubstrAllCtes,
         |${spanApplySql("", "text_dedup")}""".stripMargin,

    // Incremental screen ≡ the FULL-corpus all-occurrence coverage
    // restricted to the batch slice (doc_id % 10 = 7) — the equality
    // theorem on SuffixDedup.duplicatedSpansIncremental: the engine
    // runs batch-internal suffix ranks + a corpus gram-index probe,
    // the replay never splits corpus from batch at all.
    "dedup_substring_incremental" -> incrementalCoverageSql,

    // The BUCKETED saved-index form must agree with the in-memory
    // form bit-for-bit: the SAME restricted-coverage replay, by
    // construction (shared val — the bucket layout is an execution
    // detail the oracle can't see; any missed probe from a
    // layout/modulo bug hash-fails here).
    "dedup_substring_incremental_bucketed" -> incrementalCoverageSql,

    // The incremental apply: the same restricted coverage spans fed to
    // the shared span-removal replay over the batch spine only.
    "dedup_substring_incremental_apply" ->
      s"""WITH $substrOccCtes,
         |k AS (SELECT doc_id, pos,
         |        count(*) OVER (PARTITION BY g) AS cnt
         |      FROM occ),
         |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM k
         |      WHERE cnt > 1 AND doc_id % 10 = 7),
         |$spanIslandCtes,
         |${spanApplySql("WHERE doc_id % 10 = 7", "text_dedup")}""".stripMargin,

    // Per-lang rollup of the all-occurrence span CTEs: merged spans
    // are disjoint per doc, so summing (se − ss) is the exact covered
    // token count; docs with no spans contribute 0 via the left join.
    "report_dup_coverage" ->
      s"""WITH $exactSubstrAllCtes,
         |sp AS (SELECT doc_id, sum(se - ss) AS dup FROM (
         |         SELECT doc_id, island, min(s) AS ss, max(e) AS se
         |         FROM g2 GROUP BY 1, 2)
         |       GROUP BY doc_id),
         |d AS (SELECT t.doc_id, docs.lang,
         |        CAST(len(toks) AS BIGINT) AS nt
         |      FROM t JOIN documents docs ON t.doc_id = docs.doc_id)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(sum(dup), 0) AS BIGINT) AS n_dup_tokens,
         |       CAST(count(CASE WHEN dup > 0 THEN 1 END) AS BIGINT)
         |         AS n_docs_with_dups,
         |       round(coalesce(sum(dup), 0) * 10000.0 / sum(nt)) / 10000
         |         AS dup_share
         |FROM d LEFT JOIN sp ON d.doc_id = sp.doc_id
         |GROUP BY lang""".stripMargin,

    // Cross-algorithm twin of SuffixDedup.longestMatch: a maximal
    // aligned match of length m between two locations is exactly a
    // run of m-4 consecutive duplicated-5-gram alignments on one
    // (doc_a, doc_b, pos_a - pos_b) diagonal, so max(run + 4) per doc
    // — with the min run-start as the deterministic argmax — replays
    // the suffix-rank answer via a completely different algorithm.
    "dedup_longest_match" ->
      s"""WITH $substrOccCtes,
         |pr AS (SELECT a.doc_id AS da, a.pos AS pa,
         |              b.doc_id AS db, b.pos - a.pos AS diag
         |       FROM occ a JOIN occ b ON a.g = b.g
         |        AND (a.doc_id <> b.doc_id OR a.pos <> b.pos)),
         |rg AS (SELECT da, db, diag, pa,
         |         pa - row_number() OVER (PARTITION BY da, db, diag
         |                                 ORDER BY pa) AS grp
         |       FROM pr),
         |runs AS (SELECT da AS doc_id, min(pa) AS run_start,
         |           count(*) + 4 AS match_len
         |         FROM rg GROUP BY da, db, diag, grp),
         |best AS (SELECT doc_id, max(match_len) AS m
         |         FROM runs GROUP BY doc_id),
         |arg AS (SELECT r.doc_id, b.m, min(r.run_start) AS s
         |        FROM runs r JOIN best b
         |          ON r.doc_id = b.doc_id AND r.match_len = b.m
         |        GROUP BY r.doc_id, b.m)
         |SELECT d.doc_id,
         |       CAST(coalesce(arg.m, 0) AS INTEGER) AS longest_dup_tokens,
         |       CAST(coalesce(arg.s, -1) AS INTEGER) AS longest_dup_start
         |FROM documents d LEFT JOIN arg ON d.doc_id = arg.doc_id""".stripMargin,

    // Mirrors Dedup.gramNovelty: distinct (doc, 5-gram) pairs, gram
    // doc-frequency, per-doc share of df=1 grams; the documents spine
    // gives gramless docs their 0/0/0.0 row.
    "report_doc_novelty" ->
      s"""WITH $substrOccCtes,
         |og AS (SELECT DISTINCT doc_id, g FROM occ),
         |dfreq AS (SELECT g, count(*) AS nd FROM og GROUP BY g),
         |per AS (SELECT doc_id, count(*) AS ng,
         |          sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS nu
         |        FROM og JOIN dfreq USING (g) GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(coalesce(ng, 0) AS BIGINT) AS n_grams,
         |       CAST(coalesce(nu, 0) AS BIGINT) AS n_unique_grams,
         |       CASE WHEN coalesce(ng, 0) > 0
         |            THEN round(nu * 10000.0 / ng) / 10000
         |            ELSE 0 END AS novelty
         |FROM documents d LEFT JOIN per USING (doc_id)""".stripMargin,

    // The incremental form ≡ the FULL-corpus doc-frequency replay
    // restricted to the batch slice — the engine answers from the
    // saved (g, doc_count) state with one probe, the replay never
    // splits corpus from batch at all (the equality theorem on
    // Dedup.gramNoveltyIncremental).
    "report_doc_novelty_incremental" ->
      s"""WITH $substrOccCtes,
         |og AS (SELECT DISTINCT doc_id, g FROM occ),
         |dfreq AS (SELECT g, count(*) AS nd FROM og GROUP BY g),
         |per AS (SELECT doc_id, count(*) AS ng,
         |          sum(CASE WHEN nd = 1 THEN 1 ELSE 0 END) AS nu
         |        FROM og JOIN dfreq USING (g) GROUP BY doc_id)
         |SELECT d.doc_id,
         |       CAST(coalesce(ng, 0) AS BIGINT) AS n_grams,
         |       CAST(coalesce(nu, 0) AS BIGINT) AS n_unique_grams,
         |       CASE WHEN coalesce(ng, 0) > 0
         |            THEN round(nu * 10000.0 / ng) / 10000
         |            ELSE 0 END AS novelty
         |FROM documents d LEFT JOIN per USING (doc_id)
         |WHERE d.doc_id % 10 = 7""".stripMargin,

    // Mirrors Decontam.contaminatedSpans (GPT-3 appendix-C span
    // removal) over the decontam_overlap bench/train split — see
    // OracleCtes.decontamSpanCtes.
    "decontam_spans" ->
      s"""WITH $decontamSpanCtes
         |$spanSelectSql""".stripMargin,

    // The ingest-time screen: the same bench gram-coverage replay
    // restricted to the micro-batch slice (even train docs) — the
    // engine probes a frozen saved index, the replay never builds one.
    "decontam_substring_stream" ->
      s"""WITH $substrOccCtes,
         |bench AS (SELECT DISTINCT g FROM occ WHERE doc_id % 20 = 0),
         |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM occ
         |      WHERE doc_id % 20 <> 0 AND doc_id % 2 = 0
         |        AND g IN (SELECT g FROM bench)),
         |$spanIslandCtes
         |$spanSelectSql""".stripMargin,

    // Cross-algorithm twin of SuffixDedup.benchOverlapSpans: the
    // engine ranks train∪bench suffixes and LCPs nearest-bench
    // neighbours; the replay marks every train window whose gram sits
    // in the bench slice — identical output by the cross-side
    // coverage theorem, and byte-identical to decontam_spans' oracle
    // on purpose (gram engine and suffix engine must agree).
    "decontam_substring_exact" ->
      s"""WITH $decontamSpanCtes
         |$spanSelectSql""".stripMargin,

    // Per-lang rollup of the bench-overlap span CTEs — the
    // report_dup_coverage replay on the bench axis; merged spans are
    // disjoint per doc so sum(se − ss) is the exact contaminated-token
    // count, and span-free docs contribute 0 via the left join.
    "report_bench_contamination" ->
      s"""WITH $decontamSpanCtes,
         |sp AS (SELECT doc_id, sum(se - ss) AS contam FROM (
         |         SELECT doc_id, island, min(s) AS ss, max(e) AS se
         |         FROM g2 GROUP BY 1, 2)
         |       GROUP BY doc_id),
         |d AS (SELECT t.doc_id, docs.lang,
         |        CAST(len(toks) AS BIGINT) AS nt
         |      FROM t JOIN documents docs ON t.doc_id = docs.doc_id
         |      WHERE t.doc_id % 20 <> 0)
         |SELECT lang, count(*) AS n_docs,
         |       CAST(sum(nt) AS BIGINT) AS n_tokens,
         |       CAST(coalesce(sum(contam), 0) AS BIGINT) AS n_contam_tokens,
         |       CAST(count(CASE WHEN contam > 0 THEN 1 END) AS BIGINT)
         |         AS n_docs_contaminated,
         |       round(coalesce(sum(contam), 0) * 10000.0 / sum(nt)) / 10000
         |         AS contam_share
         |FROM d LEFT JOIN sp ON d.doc_id = sp.doc_id
         |GROUP BY lang""".stripMargin,

    // Cross twin of SuffixDedup.benchLongestOverlap: diagonal-run
    // extension of aligned train×bench 5-gram pairs (the
    // dedup_longest_match replay restricted to cross pairs).
    "decontam_longest_bench" ->
      s"""WITH $substrOccCtes,
         |pr AS (SELECT a.doc_id AS da, a.pos AS pa,
         |              b.doc_id AS db, b.pos - a.pos AS diag
         |       FROM occ a JOIN occ b ON a.g = b.g
         |       WHERE a.doc_id % 20 <> 0 AND b.doc_id % 20 = 0),
         |rg AS (SELECT da, db, diag, pa,
         |         pa - row_number() OVER (PARTITION BY da, db, diag
         |                                 ORDER BY pa) AS grp
         |       FROM pr),
         |runs AS (SELECT da AS doc_id, min(pa) AS run_start,
         |           count(*) + 4 AS match_len
         |         FROM rg GROUP BY da, db, diag, grp),
         |best AS (SELECT doc_id, max(match_len) AS m
         |         FROM runs GROUP BY doc_id),
         |arg AS (SELECT r.doc_id, b.m, min(r.run_start) AS s
         |        FROM runs r JOIN best b
         |          ON r.doc_id = b.doc_id AND r.match_len = b.m
         |        GROUP BY r.doc_id, b.m)
         |SELECT d.doc_id,
         |       CAST(coalesce(arg.m, 0) AS INTEGER) AS longest_bench_tokens,
         |       CAST(coalesce(arg.s, -1) AS INTEGER) AS longest_bench_start
         |FROM (SELECT doc_id FROM documents WHERE doc_id % 20 <> 0) d
         |LEFT JOIN arg ON d.doc_id = arg.doc_id""".stripMargin,

    // Mirrors Decontam.cleanSpans: the span-removal apply restricted
    // to the train slice of the spine.
    "decontam_spans_clean" ->
      s"""WITH $decontamSpanCtes,
         |${spanApplySql("WHERE doc_id % 20 <> 0", "text_clean")}""".stripMargin,

    "dedup_embedding" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
        |SELECT id_a, id_b, cosine FROM (
        |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
        |         round(list_dot_product(a.v, b.v) /
        |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id < b.vec_id)
        |WHERE cosine >= 0.4""".stripMargin,

    // agg_approx_distinct emits the EXACT count (portable) plus the
    // Spark-side HLL bound check |est−exact| ≤ 4·rsd·exact as a
    // boolean the oracle asserts TRUE.
    "agg_approx_distinct" ->
      """SELECT event_type, count(DISTINCT user_id) AS n_exact,
        |       TRUE AS approx_ok
        |FROM events GROUP BY 1""".stripMargin,

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

    // Mirrors Dedup.cdcChunkReport (k=8, divisor=64): the winnowing
    // polynomial gram hash in HUGEINT, boundary at char i+7 (0-based)
    // when gram i's hash ≡ 0 mod 64, chunk-md5 census per doc.
    "dedup_cdc" -> {
      val base = graft.functions.PortableHash.GramBase
      s"""WITH g AS (
         |  SELECT doc_id, text,
         |    CASE WHEN length(text) = 0 THEN [0::BIGINT]
         |    ELSE [list_reduce([unicode(substr(text, j, 1))::HUGEINT
         |            for j in generate_series(i, least(i + 7, length(text)))],
         |           (acc, c) -> (acc * $base + c) % $pSql)::BIGINT
         |          for i in generate_series(1, greatest(length(text) - 7, 1))]
         |    END AS grams
         |  FROM documents),
         |s AS (SELECT doc_id, text,
         |        [0] || [i + 7 for i in generate_series(1, len(grams))
         |                if grams[i] % 64 = 0 and i + 7 < length(text)] AS starts
         |      FROM g),
         |bnd AS (SELECT doc_id, text, starts,
         |          starts || [length(text)] AS bounds FROM s),
         |x AS (SELECT doc_id, text, starts, bounds,
         |        unnest(generate_series(1, len(starts))) AS j FROM bnd),
         |occ AS (SELECT doc_id,
         |          md5(substr(text, starts[j] + 1, bounds[j + 1] - starts[j]))
         |            AS chunk_hash,
         |          CAST(bounds[j + 1] - starts[j] AS BIGINT) AS chunk_len
         |        FROM x),
         |hd AS (SELECT chunk_hash, count(DISTINCT doc_id) AS nd
         |       FROM occ GROUP BY 1)
         |SELECT doc_id, CAST(count(*) AS BIGINT) AS n_chunks,
         |       CAST(sum(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |         AS n_shared_chunks,
         |       CAST(sum(CASE WHEN nd > 1 THEN chunk_len ELSE 0 END) AS BIGINT)
         |         AS shared_chars
         |FROM occ JOIN hd USING (chunk_hash) GROUP BY 1""".stripMargin
    },

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

    // Mirrors Decontam.overlapStats: distinct 5-gram shingles of each
    // training doc probed against the benchmark's distinct shingle set
    // (benchmark = every 20th doc), counts per contaminated doc.
    "decontam_overlap" -> decontamOverlapSql,

    // decontam_bloom is the SAME relation through the bloom-prefilter
    // plan (Decontam.overlapStatsBloom): the bitset admits no false
    // negatives and the exact-confirm join kills false positives, so
    // the exact-SQL twin is identical by construction.
    "decontam_bloom" -> decontamOverlapSql,

    // Mirrors Decontam.semanticOverlap: every corpus vector against
    // every benchmark vector (vec_id % 20), 4-dp-rounded cosine (the
    // dedup_embedding posture), flagged at floor 0.4 with hit count
    // and max cosine per doc.
    "decontam_semantic" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |b AS (SELECT v FROM e WHERE vec_id % 20 = 0),
        |c AS (SELECT vec_id, v FROM e WHERE vec_id % 20 <> 0),
        |p AS (SELECT c.vec_id AS doc_id,
        |             round(list_dot_product(c.v, b.v) /
        |                   (sqrt(list_dot_product(c.v, c.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cos
        |      FROM c, b)
        |SELECT doc_id, count(*) AS n_bench, max(cos) AS max_cosine
        |FROM p WHERE cos >= 0.4 GROUP BY 1""".stripMargin,

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
    "dedup_incremental_near" -> incrementalNearSql,

    // The SAVED-STATE form probes the identical engine
    // (newAgainstIndex) against the persisted bucketed band/shingle
    // tables — the SAME replay, by construction (shared val): any
    // drift in what the saved tables reconstruct hash-fails here.
    "dedup_incremental_near_saved" -> incrementalNearSql,

    // Mirrors SemDedup.newAgainstReferenceSemantic over the odd/even
    // split: the deterministic frozen-quantizer blocking + 4-dp
    // cosine floor replay exactly (shared val — see its scaladoc).
    "dedup_incremental_semantic" -> incrementalSemanticSql,

    // The SAVED-STATE form probes the identical screen body against
    // the persisted bucketed assignment table under the frozen
    // quantizer — the SAME replay, by construction (shared val): any
    // drift in what the saved state reconstructs hash-fails here.
    "dedup_incremental_semantic_saved" -> incrementalSemanticSql,

    // The RE-CENTER lifecycle (8-center fold -> re-quantize to 16 ->
    // probe) must land bit-identical to a from-scratch 16-center
    // freeze, because the re-draw is the same md5-min rule over the
    // state's docs — so it binds the SAME replay as the other two
    // semantic forms (shared val): a lost survivor, stale assignment,
    // or wrong re-pinned count hash-fails here.
    "dedup_semantic_recenter" -> incrementalSemanticSql,

    // Mirrors savedSemanticOccupancy over a state folded from the
    // whole embeddings corpus: the md5-min 16-center draw, argmax
    // assignment in the 4-dp integer cosine space (ties to the
    // smallest center id), exact per-cluster counts, mirrored share
    // division.
    "report_semantic_occupancy" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |c AS (SELECT vec_id AS center_id, v AS cv FROM e
        |      ORDER BY md5(vec_id::VARCHAR), vec_id LIMIT 16),
        |a AS (SELECT vec_id, center_id AS cluster FROM (
        |    SELECT e.vec_id, c.center_id,
        |      row_number() OVER (PARTITION BY e.vec_id ORDER BY
        |        round(list_dot_product(e.v, c.cv) /
        |          (sqrt(list_dot_product(e.v, e.v)) * sqrt(list_dot_product(c.cv, c.cv))) * 10000) DESC,
        |        c.center_id) AS rk
        |    FROM e CROSS JOIN c) WHERE rk = 1),
        |cnt AS (SELECT cluster, count(*) AS n_vectors FROM a GROUP BY 1),
        |t AS (SELECT sum(n_vectors) AS tt FROM cnt)
        |SELECT cluster, n_vectors,
        |       round(n_vectors * 10000.0 / tt) / 10000 AS occupancy_share
        |FROM cnt, t""".stripMargin,

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
         |                               ELSE 1000 END""".stripMargin
  )
}
