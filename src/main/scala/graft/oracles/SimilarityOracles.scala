package graft

import graft.OracleCtes._

/** DuckDB twins for the [[SimilarityQueries]] family — see the [[Oracles]]
  * scaladoc for the cross-engine determinism rules every entry obeys.
  */
private[graft] object SimilarityOracles {
  /** ONE definition of the survivors-only brute-force top-10 twin,
    * bound to BOTH saved-layout erase lifecycles (IVF and PQ): each
    * searches exhaustively after erasing the `vec_id % 5 = 1` slice,
    * so each must equal this relation exactly — sharing the val makes
    * silent divergence of the two copies impossible. */
  private lazy val eraseSurvivorsTopkSql: String =
    """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
      |           WHERE vec_id % 5 <> 1),
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

  val map: Map[String, String] = Map(
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
    // similarity_pq emits the same contract shape as ivf_kmeans:
    // recall vs brute force is checked Spark-side (KMeans codebooks
    // are engine-specific), TRUE asserted here.
    "similarity_pq" ->
      """SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

    "similarity_ivf_kmeans" ->
      """SELECT count(DISTINCT vec_id) AS n_queries, TRUE AS recall_ok
        |FROM embeddings WHERE vec_id < 5""".stripMargin,

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

    // Mirrors Similarity.knnGraph: within-label self-join, rounded
    // cosine, per-vector row_number with the neighbor-id tiebreak.
    "similarity_knn_graph" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT a.vec_id, b.vec_id AS neighbor_id,
        |         round(list_dot_product(a.v, b.v) /
        |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id)
        |SELECT vec_id, neighbor_id, cosine, rank FROM (
        |  SELECT *, CAST(row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS INTEGER) AS rank
        |  FROM scored)
        |WHERE rank <= 3""".stripMargin,

    // Mirrors operators.PageRank over the k=3 knn graph: 10 unrolled
    // power-iteration stages in exact integer micro-units (rank //
    // deg contributions, (15·(scale//n))//100 teleport,
    // (85·Σ)//100 damping — floor divisions both engines define
    // identically on non-negatives).
    "graph_pagerank" -> {
      val knn =
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |scored AS (
          |  SELECT a.vec_id, b.vec_id AS neighbor_id,
          |         round(list_dot_product(a.v, b.v) /
          |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
          |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
          |g AS (SELECT vec_id, neighbor_id FROM (
          |  SELECT vec_id, neighbor_id, row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          |  FROM scored) WHERE rank <= 3),
          |nodes AS (SELECT vec_id AS node FROM g UNION SELECT neighbor_id FROM g),
          |nn AS (SELECT count(*) AS n FROM nodes),
          |deg AS (SELECT vec_id AS node, count(*) AS deg FROM g GROUP BY 1),
          |adj AS (SELECT d.node, g.neighbor_id AS dst, d.deg
          |        FROM g JOIN deg d ON g.vec_id = d.node),
          |r0 AS (SELECT node, (SELECT 1000000000000 // n FROM nn) AS rank FROM nodes)""".stripMargin
      val stages = (1 to 10).map { i =>
        s"""c$i AS (SELECT a.dst AS node, sum(r.rank // a.deg) AS i
           |  FROM adj a JOIN r${i - 1} r ON a.node = r.node GROUP BY 1),
           |r$i AS (SELECT nd.node,
           |    (SELECT (15 * (1000000000000 // n)) // 100 FROM nn)
           |      + (85 * coalesce(c.i, 0)) // 100 AS rank
           |  FROM nodes nd LEFT JOIN c$i c ON nd.node = c.node)""".stripMargin
      }.mkString(",\n")
      s"""$knn,
         |$stages
         |SELECT node, CAST(rank AS BIGINT) AS rank FROM r10""".stripMargin
    },

    // Mirrors operators.LabelPropagation over the symmetrized k=3 knn
    // graph: 5 unrolled synchronous rounds; each round counts distinct
    // undirected neighbor votes and picks (count DESC, label ASC) —
    // exact integer counts, so the winner is engine-independent.
    "graph_communities" -> {
      val base =
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |scored AS (
          |  SELECT a.vec_id, b.vec_id AS neighbor_id,
          |         round(list_dot_product(a.v, b.v) /
          |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
          |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
          |g AS (SELECT vec_id, neighbor_id FROM (
          |  SELECT vec_id, neighbor_id, row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          |  FROM scored) WHERE rank <= 3),
          |und AS (SELECT vec_id AS a, neighbor_id AS b FROM g
          |        UNION SELECT neighbor_id, vec_id FROM g),
          |l0 AS (SELECT DISTINCT a AS node, a AS label FROM und)""".stripMargin
      val rounds = (1 to 5).map { i =>
        s"""v$i AS (SELECT u.a AS node, l.label, count(*) AS c
           |  FROM und u JOIN l${i - 1} l ON u.b = l.node GROUP BY 1, 2),
           |w$i AS (SELECT node, label FROM (
           |    SELECT node, label, row_number() OVER (
           |      PARTITION BY node ORDER BY c DESC, label ASC) AS rn FROM v$i)
           |  WHERE rn = 1),
           |l$i AS (SELECT p.node, coalesce(w.label, p.label) AS label
           |  FROM l${i - 1} p LEFT JOIN w$i w ON p.node = w.node)""".stripMargin
      }.mkString(",\n")
      s"""$base,
         |$rounds
         |SELECT node, label AS community FROM l5""".stripMargin
    },

    // Mirrors similarityMrlRecall: full-dim and first-16-dim-prefix
    // top-5 rankings (both 4-dp cosine + id tiebreak), per-query hit
    // count and one mirrored recall division.
    "similarity_mrl_recall" ->
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 5),
        |fullr AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |           round(list_dot_product(q.v, c.v) /
        |                 (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) * 10000) / 10000 DESC,
        |           c.vec_id ASC) AS rank
        |  FROM e c CROSS JOIN q WHERE q.vec_id <> c.vec_id)
        |  WHERE rank <= 5),
        |e16 AS (SELECT vec_id, v[1:16] AS v FROM e),
        |q16 AS (SELECT * FROM e16 WHERE vec_id < 5),
        |truncr AS (SELECT query_id, neighbor_id FROM (
        |  SELECT q16.vec_id AS query_id, c.vec_id AS neighbor_id,
        |         row_number() OVER (PARTITION BY q16.vec_id ORDER BY
        |           round(list_dot_product(q16.v, c.v) /
        |                 (sqrt(list_dot_product(q16.v, q16.v)) * sqrt(list_dot_product(c.v, c.v))) * 10000) / 10000 DESC,
        |           c.vec_id ASC) AS rank
        |  FROM e16 c CROSS JOIN q16 WHERE q16.vec_id <> c.vec_id)
        |  WHERE rank <= 5),
        |h AS (SELECT query_id, CAST(count(*) AS BIGINT) AS nh
        |      FROM truncr WHERE EXISTS (SELECT 1 FROM fullr
        |        WHERE fullr.query_id = truncr.query_id
        |          AND fullr.neighbor_id = truncr.neighbor_id)
        |      GROUP BY query_id)
        |SELECT f.query_id, coalesce(h.nh, 0) AS n_hits,
        |       round(coalesce(h.nh, 0) * 10000.0 / f.nt) / 10000 AS recall
        |FROM (SELECT query_id, count(*) AS nt FROM fullr GROUP BY query_id) f
        |LEFT JOIN h ON f.query_id = h.query_id""".stripMargin,

    // Mirrors operators.TriangleCount over the symmetrized k=3 knn
    // graph: (degree, id)-oriented wedges closed against the
    // id-canonical edge set — each triangle counts once at its
    // orientation-minimal node, then fans out to all three members.
    "graph_triangles" -> {
      val base =
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |scored AS (
          |  SELECT a.vec_id, b.vec_id AS neighbor_id,
          |         round(list_dot_product(a.v, b.v) /
          |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
          |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
          |g AS (SELECT vec_id, neighbor_id FROM (
          |  SELECT vec_id, neighbor_id, row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          |  FROM scored) WHERE rank <= 3),
          |und AS (SELECT vec_id AS a, neighbor_id AS b FROM g
          |        UNION SELECT neighbor_id, vec_id FROM g)""".stripMargin
      s"""$base,
         |canon AS (SELECT a, b FROM und WHERE a < b),
         |deg AS (SELECT a, count(*) AS d FROM und GROUP BY a),
         |o AS (SELECT CASE WHEN da < db OR (da = db AND a < b) THEN a ELSE b END AS u,
         |             CASE WHEN da < db OR (da = db AND a < b) THEN b ELSE a END AS v
         |      FROM (SELECT c.a, c.b, x.d AS da, y.d AS db
         |            FROM canon c JOIN deg x ON c.a = x.a
         |                         JOIN deg y ON c.b = y.a)),
         |w AS (SELECT x.u, x.v AS p, y.v AS q
         |      FROM o x JOIN o y ON x.u = y.u AND x.v < y.v),
         |tri AS (SELECT u, p, q FROM w
         |        WHERE EXISTS (SELECT 1 FROM canon
         |                      WHERE canon.a = w.p AND canon.b = w.q)),
         |cnt AS (SELECT node, CAST(count(*) AS BIGINT) AS n
         |        FROM (SELECT unnest([u, p, q]) AS node FROM tri)
         |        GROUP BY node)
         |SELECT nd.a AS vec_id, coalesce(cnt.n, 0) AS n_triangles
         |FROM (SELECT DISTINCT a FROM und) nd
         |LEFT JOIN cnt ON nd.a = cnt.node""".stripMargin
    },

    // Mirrors operators.KCore over the symmetrized k=3 knn graph:
    // 8 unrolled iterated-h-index rounds from the degree start —
    // H = max(min(score, rank)) per node, which is invariant to
    // row_number tie order among equal scores, so no tiebreak is
    // needed for engine agreement.
    "graph_kcore" -> {
      val base =
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |scored AS (
          |  SELECT a.vec_id, b.vec_id AS neighbor_id,
          |         round(list_dot_product(a.v, b.v) /
          |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
          |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
          |g AS (SELECT vec_id, neighbor_id FROM (
          |  SELECT vec_id, neighbor_id, row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          |  FROM scored) WHERE rank <= 3),
          |und AS (SELECT vec_id AS a, neighbor_id AS b FROM g
          |        UNION SELECT neighbor_id, vec_id FROM g),
          |c0 AS (SELECT a AS node, CAST(count(*) AS BIGINT) AS c FROM und GROUP BY 1)""".stripMargin
      val rounds = (1 to 8).map { i =>
        s"""h$i AS (SELECT a, max(least(cb, rn)) AS h FROM (
           |    SELECT u.a, c.c AS cb, row_number() OVER (
           |      PARTITION BY u.a ORDER BY c.c DESC) AS rn
           |    FROM und u JOIN c${i - 1} c ON u.b = c.node)
           |  GROUP BY a),
           |c$i AS (SELECT p.node, least(p.c, coalesce(h.h, p.c)) AS c
           |  FROM c${i - 1} p LEFT JOIN h$i h ON p.node = h.a)""".stripMargin
      }.mkString(",\n")
      s"""$base,
         |$rounds
         |SELECT node AS vec_id, c AS coreness FROM c8""".stripMargin
    },

    // Mirrors operators.LinkPredict over the symmetrized k=3 knn
    // graph: wedge-join common neighbors, existing edges anti-joined
    // away, 4-dp neighborhood Jaccard, per-node top-5 under
    // (jaccard DESC, cn DESC, id ASC).
    "graph_link_predict" -> {
      val base =
        """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
          |scored AS (
          |  SELECT a.vec_id, b.vec_id AS neighbor_id,
          |         round(list_dot_product(a.v, b.v) /
          |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
          |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
          |g AS (SELECT vec_id, neighbor_id FROM (
          |  SELECT vec_id, neighbor_id, row_number() OVER (
          |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
          |  FROM scored) WHERE rank <= 3),
          |und AS (SELECT vec_id AS a, neighbor_id AS b FROM g
          |        UNION SELECT neighbor_id, vec_id FROM g)""".stripMargin
      s"""$base,
         |deg AS (SELECT a, CAST(count(*) AS BIGINT) AS d FROM und GROUP BY a),
         |cn AS (SELECT w1.x AS a, w2.y AS b, CAST(count(*) AS BIGINT) AS cn
         |       FROM (SELECT b AS m, a AS x FROM und) w1
         |       JOIN (SELECT a AS m, b AS y FROM und) w2 USING (m)
         |       WHERE w1.x < w2.y GROUP BY 1, 2),
         |cand AS (SELECT cn.a, cn.b, cn.cn FROM cn
         |         WHERE NOT EXISTS (SELECT 1 FROM und
         |                           WHERE und.a = cn.a AND und.b = cn.b)),
         |sc AS (SELECT c.a, c.b, c.cn AS common_neighbors,
         |         round(CAST(c.cn * 10000 AS DOUBLE) /
         |               (x.d + y.d - c.cn)) / 10000 AS jaccard
         |       FROM cand c JOIN deg x ON c.a = x.a JOIN deg y ON c.b = y.a)
         |SELECT a AS node_a, b AS node_b, common_neighbors, jaccard,
         |       CAST(rank AS INTEGER) AS rank
         |FROM (SELECT *, row_number() OVER (PARTITION BY a ORDER BY
         |        jaccard DESC, common_neighbors DESC, b ASC) AS rank
         |      FROM sc)
         |WHERE rank <= 5""".stripMargin
    },

    // Mirrors similarityRrf: 3-gram-Jaccard lexical top-20 over
    // documents ⊕ 4-dp-cosine dense top-20 over embeddings, fused by
    // integer-scaled reciprocal-rank contributions round(1e6/(60+r))
    // — exact longs, so the sum and the (sum DESC, doc ASC) ranking
    // are engine-independent.
    "similarity_rrf" ->
      s"""WITH w AS (SELECT doc_id, ${graft.OracleCtes.wsToks("text")} AS toks FROM documents),
        |sh AS (SELECT doc_id,
        |         list_distinct([toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2]
        |                        for i in generate_series(1, len(toks) - 2)]) AS s
        |       FROM w WHERE len(toks) >= 3),
        |cex AS (SELECT doc_id, unnest(s) AS shingle FROM sh),
        |qex AS (SELECT doc_id AS query_id, unnest(s) AS shingle FROM sh
        |        WHERE doc_id < 3),
        |sz AS (SELECT doc_id, CAST(len(s) AS INTEGER) AS n_sh FROM sh),
        |inter AS (SELECT q.query_id, c.doc_id, count(*) AS n_inter
        |          FROM cex c JOIN qex q ON c.shingle = q.shingle
        |                                AND c.doc_id <> q.query_id
        |          GROUP BY 1, 2),
        |lexj AS (SELECT query_id, i.doc_id,
        |           round(CAST(n_inter * 10000 AS DOUBLE) /
        |                 (sq.n_sh + sc.n_sh - n_inter)) / 10000 AS j
        |         FROM inter i
        |         JOIN sz sq ON sq.doc_id = i.query_id
        |         JOIN sz sc ON sc.doc_id = i.doc_id),
        |lex AS (SELECT query_id, doc_id, rank FROM (
        |  SELECT query_id, doc_id, row_number() OVER (
        |    PARTITION BY query_id ORDER BY j DESC, doc_id ASC) AS rank
        |  FROM lexj) WHERE rank <= 20),
        |e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |q AS (SELECT * FROM e WHERE vec_id < 3),
        |sem AS (SELECT query_id, doc_id, rank FROM (
        |  SELECT q.vec_id AS query_id, c.vec_id AS doc_id,
        |         row_number() OVER (PARTITION BY q.vec_id ORDER BY
        |           round(list_dot_product(q.v, c.v) /
        |                 (sqrt(list_dot_product(q.v, q.v)) * sqrt(list_dot_product(c.v, c.v))) * 10000) / 10000 DESC,
        |           c.vec_id ASC) AS rank
        |  FROM e c CROSS JOIN q WHERE q.vec_id <> c.vec_id)
        |  WHERE rank <= 20),
        |contrib AS (
        |  SELECT query_id, doc_id,
        |         CAST(round(1000000.0 / (60 + rank)) AS BIGINT) AS c FROM lex
        |  UNION ALL
        |  SELECT query_id, doc_id,
        |         CAST(round(1000000.0 / (60 + rank)) AS BIGINT) FROM sem),
        |fused AS (SELECT query_id, doc_id, CAST(count(*) AS BIGINT) AS n_lists,
        |                 sum(c) AS s
        |          FROM contrib GROUP BY 1, 2)
        |SELECT query_id, doc_id, n_lists, fused_rank,
        |       CAST(s AS DOUBLE) / 1000000 AS rrf_score
        |FROM (SELECT *, CAST(row_number() OVER (
        |        PARTITION BY query_id ORDER BY s DESC, doc_id ASC) AS INTEGER)
        |        AS fused_rank FROM fused)
        |WHERE fused_rank <= 10""".stripMargin,

    // Mirrors Similarity.mineTriplets over the k=5 knn graph:
    // positive = rank 1, negative = lowest-rank neighbor at rank ≥ 3
    // with cosine ≤ pos_cosine − 0.05 (margin applied in the shared
    // 4-dp-rounded space, so the subtraction is bit-identical).
    "mine_triplets" ->
      """WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
        |scored AS (
        |  SELECT a.vec_id, b.vec_id AS neighbor_id,
        |         round(list_dot_product(a.v, b.v) /
        |               (sqrt(list_dot_product(a.v, a.v)) * sqrt(list_dot_product(b.v, b.v))) * 10000) / 10000 AS cosine
        |  FROM e a JOIN e b ON a.label = b.label AND a.vec_id <> b.vec_id),
        |g AS (SELECT * FROM (
        |  SELECT vec_id, neighbor_id, cosine, row_number() OVER (
        |    PARTITION BY vec_id ORDER BY cosine DESC, neighbor_id ASC) AS rank
        |  FROM scored) WHERE rank <= 5),
        |pos AS (SELECT vec_id, neighbor_id AS positive_id,
        |               cosine AS pos_cosine FROM g WHERE rank = 1),
        |neg AS (SELECT * FROM (
        |  SELECT g.vec_id, g.neighbor_id AS negative_id,
        |         g.cosine AS neg_cosine,
        |         row_number() OVER (PARTITION BY g.vec_id
        |                            ORDER BY g.rank) AS rn
        |  FROM g JOIN pos USING (vec_id)
        |  WHERE g.rank >= 3 AND g.cosine <= pos_cosine - 0.05)
        |  WHERE rn = 1)
        |SELECT p.vec_id AS anchor_id, p.positive_id, p.pos_cosine,
        |       n.negative_id, n.neg_cosine
        |FROM pos p JOIN neg n USING (vec_id)""".stripMargin,

    // Exhaustive-probe IVF ≡ brute force by construction, so the
    // oracle IS the similarity_topk query: cosine over all candidate
    // pairs, top-10 per query with the id tiebreak. k-means centroids
    // never appear in the result — every cluster is probed.
    // similarity_ivf_exhaustive probes every cluster, so its relation
    // IS brute-force top-k — same twin as similarity_topk.
    "similarity_ivf_exhaustive" -> similarityTopkSql,

    // Incremental append + exhaustive probe ≡ brute force over the
    // full corpus by construction (the ivf_exhaustive argument — the
    // 80/20 build/append split must be invisible in the result), so
    // the append machinery gets the exact similarity_topk oracle.
    "similarity_ivf_append" -> similarityTopkSql,

    // Erase + exhaustive probe ≡ brute force over the SURVIVORS by
    // construction: the vec_id % 5 = 1 slice is appended then erased,
    // so it must be invisible on BOTH sides of the search — an
    // un-erased row, a lost survivor, or an over-deleted cluster
    // hash-fails against this survivors-only twin.
    "similarity_ivf_erase" -> eraseSurvivorsTopkSql,

    // The PQ erase searches with candidateFactor sized so every
    // survivor reaches the exact rerank (the ADC stage can hide
    // nothing) — ≡ brute force over the survivors by the same
    // argument, so it binds the SAME survivors-only twin (shared
    // val): an un-erased codes row or a lost survivor hash-fails.
    "similarity_pq_erase" -> eraseSurvivorsTopkSql,

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
        |FROM q""".stripMargin
  )
}
