package graft

/** Shared SQL fragments for the per-family oracle objects: CTE
  * builders and whole-statement twins reused by more than one entry
  * (or too large to inline). Split out of the former single-file
  * [[Oracles]] (r10 VERDICT #7).
  */
private[graft] object OracleCtes {

  // Exact average: BIGINT micro-sum then IEEE divisions — bit-identical
  // to Spark's plan (see Queries.exactAvg).
  private[graft] val exactAvgSql =
    "CAST(sum(CAST(round(value * 1000000) AS BIGINT)) AS DOUBLE) / count(value) / 1000000"

  private[graft] val dailySilverCte =
    s"""SELECT event_type AS indicator,
      |       CAST(year(ts) AS INTEGER) AS observation_year,
      |       CAST(month(ts) AS INTEGER) AS observation_month,
      |       CAST(day(ts) AS INTEGER) AS observation_day,
      |       $exactAvgSql AS value,
      |       count(value) AS observation_count
      |FROM events GROUP BY 1, 2, 3, 4""".stripMargin

  private[graft] val dailySeriesCte =
    s"SELECT indicator, observation_day, value FROM ($dailySilverCte)"

  // ASCII-whitespace tokenizer — the SQL twin of TextOps.tokens /
  // HashedWordShingles.tokenSpans: split on runs of [ \t\n\x0B\f\r]
  // (Java `\s` spelled out — RE2's `\s` omits \x0B), empty tokens
  // (leading/trailing whitespace) dropped.
  private[graft] def wsToks(c: String): String =
    s"list_filter(regexp_split_to_array($c, '[ \\t\\n\\x0b\\f\\r]+'), t -> t <> '')"

  // Total characters across tokens — the whitespace-robust twin of
  // TextOps.tokenCharSum (empty token list sums to 0, like the Spark
  // aggregate's 0 init).
  private[graft] def tokCharSum(toks: String): String =
    s"coalesce(list_sum(list_transform($toks, t -> length(t))), 0)"

  // The n-gram Jaccard pair query — used standalone (dedup_ngram) and
  // as the edge set of the connected-components oracle.
  private[graft] val dedupNgramSql =
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
  private[graft] val pSql = graft.functions.PortableHash.PSql

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
  private[graft] def minhashCtes(source: String): String =
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
  private[graft] def bpeCtes(n: Int): String = {
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

  /** Unrolled unigram-LM hard-EM training (mirrors ext.Unigram): seed
    * substring counts (usc) → count·length-ranked seed vocabulary +
    * alphabet (uv0) → floor-log2 costs (upc0) → Viterbi dp unrolled
    * one stage per position (ua1..ua{maxW}, tiebreak cost ASC then
    * start-position ASC via row_number) → E-step recount (ue1) →
    * prune + alphabet (uv1) → final costs (upc1) → second Viterbi
    * pass (ub*) → final segmentation (useg). Words longer than maxW
    * code points take the single-code-point fallback on both sides,
    * which is what bounds this unroll STRUCTURALLY — the stage count
    * is the operator's hyperparameter, not a data-dependent guess.
    * Every dp stage is AS MATERIALIZED (the [[bpeCtes]] lesson:
    * DuckDB inlines plain CTEs and each stage is read by up to
    * maxPieceLen successors). Final relations: upc1(piece, cnt,
    * cost), useg(word, wl, freq, seg). */
  private[graft] def unigramCtes(seedSize: Int, vocabSize: Int,
      maxP: Int, maxW: Int): String = {
    def viterbi(prefix: String, costTbl: String): (Seq[String], String) = {
      val z = s"${prefix}0 AS (SELECT word, wl, freq, " +
        s"CAST(0 AS BIGINT) AS cost, '' AS seg FROM uwords WHERE wl <= $maxW)"
      val stages = (1 to maxW).map { p =>
        val arms = (math.max(0, p - maxP) until p).map { j =>
          val seg = if (j == 0) "pc.piece" else "d.seg || '~' || pc.piece"
          s"SELECT d.word, d.wl, d.freq, d.cost + pc.cost AS cost, " +
            s"$seg AS seg, $j AS j FROM $prefix$j d JOIN $costTbl pc " +
            s"ON pc.piece = substr(d.word, ${j + 1}, ${p - j}) WHERE d.wl >= $p"
        }.mkString(" UNION ALL ")
        s"$prefix$p AS MATERIALIZED (SELECT word, wl, freq, cost, seg FROM (" +
          "SELECT word, wl, freq, cost, seg, row_number() OVER " +
          "(PARTITION BY word ORDER BY cost ASC, j ASC) AS rn " +
          s"FROM ($arms)) WHERE rn = 1)"
      }
      val finals = (1 to maxW)
        .map(p => s"SELECT word, wl, freq, seg FROM $prefix$p WHERE wl = $p")
        .mkString(" UNION ALL ")
      (z +: stages, finals)
    }
    val head = Seq(
      """uwords AS MATERIALIZED (
        |  SELECT word, CAST(length(word) AS INTEGER) AS wl,
        |         CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |          '[^\p{L}\p{N}]+'), x -> len(x) > 0)) AS word FROM documents)
        |  GROUP BY 1, 2)""".stripMargin,
      s"""usc AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt FROM (
        |    SELECT substr(word, s, l) AS piece, freq
        |    FROM uwords, unnest(range(1, wl + 1)) AS ts(s),
        |         unnest(range(1, $maxP + 1)) AS tl(l)
        |    WHERE s + l - 1 <= wl)
        |  GROUP BY 1)""".stripMargin,
      s"""useedtop AS MATERIALIZED (SELECT piece, cnt FROM (
        |    SELECT piece, cnt, row_number() OVER
        |      (ORDER BY cnt * length(piece) DESC, piece ASC) AS rn FROM usc)
        |  WHERE rn <= $seedSize)""".stripMargin,
      "uchars AS (SELECT piece, cnt FROM usc WHERE length(piece) = 1)",
      """uv0 AS MATERIALIZED (
        |  SELECT piece, cnt FROM useedtop
        |  UNION ALL
        |  SELECT piece, cnt FROM uchars
        |  WHERE piece NOT IN (SELECT piece FROM useedtop))""".stripMargin,
      "ut0 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM uv0)",
      """upc0 AS MATERIALIZED (SELECT piece,
        |  CAST(length(bin(t + 1)) - length(bin(cnt + 1)) AS BIGINT) AS cost
        |  FROM uv0, ut0)""".stripMargin)
    val (va, vaFin) = viterbi("ua", "upc0")
    val mid = Seq(
      s"""useg0 AS MATERIALIZED (
        |  $vaFin
        |  UNION ALL
        |  SELECT word, wl, freq,
        |         array_to_string(string_split(word, ''), '~') AS seg
        |  FROM uwords WHERE wl > $maxW)""".stripMargin,
      """ue1 AS MATERIALIZED (
        |  SELECT piece, CAST(sum(freq) AS BIGINT) AS cnt
        |  FROM (SELECT unnest(string_split(seg, '~')) AS piece, freq FROM useg0)
        |  GROUP BY 1)""".stripMargin,
      s"""utop AS MATERIALIZED (SELECT piece, cnt FROM (
        |    SELECT piece, cnt, row_number() OVER
        |      (ORDER BY cnt DESC, piece ASC) AS rn FROM ue1)
        |  WHERE rn <= $vocabSize)""".stripMargin,
      """uv1 AS MATERIALIZED (
        |  SELECT piece, cnt FROM utop
        |  UNION ALL
        |  SELECT c.piece, CAST(coalesce(e.cnt, 0) AS BIGINT) AS cnt
        |  FROM (SELECT DISTINCT piece FROM uchars) c
        |  LEFT JOIN ue1 e USING (piece)
        |  WHERE c.piece NOT IN (SELECT piece FROM utop))""".stripMargin,
      "ut1 AS (SELECT CAST(sum(cnt) AS BIGINT) AS t FROM uv1)",
      """upc1 AS MATERIALIZED (SELECT piece, cnt,
        |  CAST(length(bin(t + 1)) - length(bin(cnt + 1)) AS BIGINT) AS cost
        |  FROM uv1, ut1)""".stripMargin)
    val (vb, vbFin) = viterbi("ub", "upc1")
    val tail = Seq(
      s"""useg AS MATERIALIZED (
        |  $vbFin
        |  UNION ALL
        |  SELECT word, wl, freq,
        |         array_to_string(string_split(word, ''), '~') AS seg
        |  FROM uwords WHERE wl > $maxW)""".stripMargin)
    (head ++ va ++ mid ++ vb ++ tail).mkString(",\n")
  }

  /** Unrolled WordPiece training stages (mirrors
    * ext.WordPiece.trainMerges): wp0 is the word-frequency table with
    * '~'-joined code-point symbols; each stage counts adjacent symbol
    * pairs (wpp_i) AND per-symbol occurrences (wps_i), both
    * frequency-weighted, takes the winner under the quantized
    * likelihood key `floor(cnt · 2^40 / (cnt_l · cnt_r))` in HUGEINT
    * (wpb_i — the JVM side computes the identical floor in BigInt),
    * and applies it as a literal replace (wp_i) with the same
    * empty-stage guard as [[bpeCtes]]. Every stage AS MATERIALIZED
    * (the bpeCtes lesson). */
  private[graft] def wordpieceCtes(n: Int): String = {
    val scale = graft.ext.WordPiece.ScoreScale
    val wp0 =
      """wp0 AS MATERIALIZED (
        |  SELECT word, array_to_string(string_split(word, ''), '~') AS symbols,
        |         CAST(count(*) AS BIGINT) AS freq
        |  FROM (SELECT unnest(list_filter(regexp_split_to_array(lower(text),
        |          '[^\p{L}\p{N}]+'), x -> len(x) > 0)) AS word FROM documents)
        |  GROUP BY 1, 2)""".stripMargin
    val stages = (1 to n).map { i =>
      s"""wpp$i AS MATERIALIZED (SELECT z[1] AS l, z[2] AS r, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(list_zip(t[:-2], t[2:])) AS z
         |        FROM (SELECT string_split(symbols, '~') AS t, freq FROM wp${i - 1}))
         |  GROUP BY 1, 2),
         |wps$i AS MATERIALIZED (SELECT sym, CAST(sum(freq) AS BIGINT) AS cnt
         |  FROM (SELECT freq, unnest(string_split(symbols, '~')) AS sym FROM wp${i - 1})
         |  GROUP BY 1),
         |wpb$i AS MATERIALIZED (SELECT l, r, cnt,
         |    CAST((cnt::HUGEINT * $scale) // (cl::HUGEINT * cr::HUGEINT) AS BIGINT)
         |      AS score_key
         |  FROM (SELECT p.l, p.r, p.cnt, sl.cnt AS cl, sr.cnt AS cr
         |        FROM wpp$i p JOIN wps$i sl ON sl.sym = p.l
         |                     JOIN wps$i sr ON sr.sym = p.r)
         |  ORDER BY (cnt::HUGEINT * $scale) // (cl::HUGEINT * cr::HUGEINT) DESC,
         |           l ASC, r ASC LIMIT 1),
         |wp$i AS MATERIALIZED (SELECT word,
         |    CASE WHEN (SELECT count(*) FROM wpb$i) = 0 THEN symbols
         |         ELSE replace(symbols, (SELECT l || '~' || r FROM wpb$i),
         |                      (SELECT l || r FROM wpb$i)) END AS symbols,
         |    freq FROM wp${i - 1})""".stripMargin
    }
    (wp0 +: stages).mkString(",\n")
  }

  /** Greedy longest-match-first WordPiece segmentation (mirrors
    * ext.WordPiece.segment), appended after [[wordpieceCtes]]: the
    * matching vocabulary wpv = corpus alphabet + each step's merged
    * token, then one unrolled stage per consumed piece (a word of ≤
    * maxW code points finishes in ≤ maxW greedy steps — each consumes
    * ≥ 1 code point, the structural bound). Non-initial pieces carry
    * the '##' continuation marker; words longer than maxW (excluded
    * from wg0) or hitting an unmatchable position (dropped by the
    * join) surface as the single token '[UNK]' via the final LEFT
    * JOIN. Final relation wpseg(word, freq, seg, n_tokens). */
  private[graft] def wordpieceSegCtes(n: Int, maxW: Int = 16): String = {
    val wpv =
      s"""wpv AS MATERIALIZED (SELECT DISTINCT piece FROM (
         |  SELECT unnest(string_split(word, '')) AS piece FROM wp0
         |  UNION ALL
         |  ${(1 to n).map(i => s"SELECT l || r AS piece FROM wpb$i")
              .mkString("\n  UNION ALL\n  ")}))""".stripMargin
    val wg0 =
      s"""wg0 AS (SELECT word, CAST(length(word) AS INTEGER) AS wl, freq,
         |          0 AS pos, '' AS seg
         |        FROM wp0 WHERE length(word) <= $maxW)""".stripMargin
    val stages = (1 to maxW).map { k =>
      s"""wg$k AS MATERIALIZED (
         |  SELECT word, wl, freq, pos, seg FROM (
         |    SELECT g.word, g.wl, g.freq,
         |           g.pos + length(v.piece) AS pos,
         |           CASE WHEN g.pos = 0 THEN v.piece
         |                ELSE g.seg || '~##' || v.piece END AS seg,
         |           row_number() OVER (PARTITION BY g.word
         |             ORDER BY length(v.piece) DESC) AS rn
         |    FROM wg${k - 1} g JOIN wpv v
         |      ON v.piece = substr(g.word, g.pos + 1, length(v.piece))
         |    WHERE g.pos < g.wl)
         |  WHERE rn = 1
         |  UNION ALL
         |  SELECT word, wl, freq, pos, seg FROM wg${k - 1} WHERE pos >= wl)""".stripMargin
    }
    val wpseg =
      s"""wpseg AS MATERIALIZED (
         |  SELECT w.word, w.freq,
         |         CASE WHEN g.seg IS NULL THEN '[UNK]' ELSE g.seg END AS seg,
         |         CAST(CASE WHEN g.seg IS NULL THEN 1
         |              ELSE len(string_split(g.seg, '~')) END AS INTEGER) AS n_tokens
         |  FROM wp0 w LEFT JOIN
         |    (SELECT word, seg FROM wg$maxW WHERE pos >= wl) g
         |    ON g.word = w.word)""".stripMargin
    (Seq(wpv, wg0) ++ stages :+ wpseg).mkString(",\n")
  }

  private[graft] val lshPairCtes: String =
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
  private[graft] def minhashClusterCtes(keptSource: String): String =
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
  private[graft] def winnowCtes(k: Int, w: Int): String = {
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

  // Sliding 5-gram occurrences with 0-based positions over all
  // documents — relation occ(doc_id, pos, g). Base of every
  // token-span oracle (substring dedup + span decontam).
  private[graft] def substrOccCtesFor(source: String): String =
    s"""t AS (SELECT doc_id, ${wsToks("text")} AS toks FROM $source),
       |x AS (SELECT doc_id, toks,
       |        unnest(generate_series(1, len(toks) - 4)) AS i FROM t),
       |occ AS (SELECT doc_id, i - 1 AS pos,
       |          array_to_string(toks[i : i + 4], ' ') AS g FROM x)""".stripMargin

  private[graft] val substrOccCtes: String = substrOccCtesFor("documents")

  // Gaps-and-islands interval union over marked windows m(doc_id, s, e)
  // — the running-max-end window of Dedup.mergeTokenSpans. Final
  // relation g2(doc_id, s, e, island); merged spans = GROUP BY
  // doc_id, island.
  private[graft] val spanIslandCtes: String =
    """isl AS (SELECT doc_id, s, e,
      |          CASE WHEN s > coalesce(max(e) OVER (PARTITION BY doc_id
      |                 ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING
      |                 AND 1 PRECEDING), -1)
      |               THEN 1 ELSE 0 END AS nw
      |        FROM m),
      |g2 AS (SELECT doc_id, s, e,
      |         sum(nw) OVER (PARTITION BY doc_id ORDER BY s) AS island
      |       FROM isl)""".stripMargin

  // Merged spans → final span rows (the dedup_substring /
  // decontam_spans SELECT).
  private[graft] val spanSelectSql: String =
    """SELECT doc_id,
      |       CAST(min(s) AS INTEGER) AS span_start,
      |       CAST(max(e) AS INTEGER) AS span_end,
      |       CAST(max(e) - min(s) AS INTEGER) AS span_tokens
      |FROM g2 GROUP BY doc_id, island""".stripMargin

  // ExactSubstr span detection (mirrors Dedup.exactSubstrSpans):
  // duplicated grams gated on the window count, non-first occurrences
  // by the (doc, pos) total order — row_number ↔ min(struct),
  // identical order — then the shared interval union.
  private[graft] val exactSubstrCtes: String =
    s"""$substrOccCtes,
       |k AS (SELECT doc_id, pos,
       |        row_number() OVER (PARTITION BY g ORDER BY doc_id, pos) AS rn,
       |        count(*) OVER (PARTITION BY g) AS cnt
       |      FROM occ),
       |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM k
       |      WHERE cnt > 1 AND rn > 1),
       |$spanIslandCtes""".stripMargin

  // ALL-occurrence variant (mirrors SuffixDedup.duplicatedSpans'
  // OUTPUT, deliberately via the other algorithm): the engine runs
  // prefix-doubling suffix ranks + LCP descent; this replay marks
  // every window of every duplicated 5-gram — identical merged
  // regions by the coverage theorem in SuffixDedup's scaladoc
  // (duplicated spans ≥ L are exactly the unions of duplicated
  // L-gram windows). No first-occurrence keep.
  private[graft] val exactSubstrAllCtes: String =
    s"""$substrOccCtes,
       |k AS (SELECT doc_id, pos,
       |        count(*) OVER (PARTITION BY g) AS cnt
       |      FROM occ),
       |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM k
       |      WHERE cnt > 1),
       |$spanIslandCtes""".stripMargin

  // Span decontamination (mirrors Decontam.contaminatedSpans over the
  // decontam_overlap bench/train split): EVERY train window whose gram
  // sits in the bench slice's gram set is marked — no first-occurrence
  // keep — then the shared interval union.
  private[graft] val decontamSpanCtes: String =
    s"""$substrOccCtes,
       |bench AS (SELECT DISTINCT g FROM occ WHERE doc_id % 20 = 0),
       |m AS (SELECT doc_id, pos AS s, pos + 5 AS e FROM occ
       |      WHERE doc_id % 20 <> 0
       |        AND g IN (SELECT g FROM bench)),
       |$spanIslandCtes""".stripMargin

  // Span-removal apply over g2 (mirrors Dedup.applySpanRemoval):
  // covered tokens (0-based position inside any merged [ss, se)
  // region) drop via NOT EXISTS, survivors reassemble ORDER BY
  // position, and the doc spine's left joins give span-free and
  // token-free docs their pass-through row. `spineWhere` restricts the
  // spine (and token stream) when the operator runs on a slice.
  private[graft] def spanApplySql(spineWhere: String, outCol: String): String =
    s"""sp AS (SELECT doc_id, min(s) AS ss, max(e) AS se
       |       FROM g2 GROUP BY doc_id, island),
       |tk AS (SELECT doc_id, i, toks[i] AS tok
       |       FROM (SELECT doc_id, toks,
       |               unnest(generate_series(1, len(toks))) AS i FROM t
       |             $spineWhere)),
       |kept AS (SELECT doc_id, i, tok FROM tk
       |         WHERE NOT EXISTS (SELECT 1 FROM sp
       |           WHERE sp.doc_id = tk.doc_id
       |             AND sp.ss <= tk.i - 1 AND tk.i - 1 < sp.se)),
       |cnt AS (SELECT doc_id, len(toks) AS n FROM t $spineWhere),
       |re AS (SELECT doc_id, count(*) AS n_kept,
       |         string_agg(tok, ' ' ORDER BY i) AS $outCol
       |       FROM kept GROUP BY doc_id)
       |SELECT d.doc_id,
       |       CAST(coalesce(n, 0) AS INTEGER) AS n_tokens,
       |       CAST(coalesce(n, 0) - coalesce(n_kept, 0) AS INTEGER) AS n_removed,
       |       coalesce($outCol, '') AS $outCol
       |FROM documents d
       |LEFT JOIN cnt USING (doc_id)
       |LEFT JOIN re USING (doc_id)
       |$spineWhere""".stripMargin

  private[graft] val decontamOverlapSql =
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
  private[graft] val similarityTopkSql =
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
  private[graft] val profileColumnsSql =
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
  private[graft] val lshExhaustiveSql =
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
  private[graft] def mortonSql(x: String, y: String, bits: Int): String =
    (0 until bits).map(i =>
      s"(((($x) >> $i) & 1) << ${2 * i}) | (((($y) >> $i) & 1) << ${2 * i + 1})")
      .mkString(" | ")
}
