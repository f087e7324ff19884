package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VectorMath.cosineF

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k — broadcast the (small) query set
  * against the (huge) corpus, score with the codegen'd
  * [[graft.functions.DotProductFloat]], rank per query. The corpus side
  * is never shuffled: the join is a BroadcastNestedLoopJoin over a few
  * query rows, so the scan parallelism is the corpus partitioning —
  * exactly the plan that survives a 1000-executor 100 TB corpus as long
  * as |queries| per wave is bounded (chunk the query set upstream).
  *
  * Scale path: IVF-style blocked search — restrict scoring to corpus
  * rows in the query's coarse partition (cluster id / label), turning
  * the nested loop into an equality join with Σ block² work.
  */
object Similarity {

  /** Top-k neighbors per query row.
    *
    * @param corpus  (idCol, vecCol, …) — the big side, scanned once
    * @param queries (idCol, vecCol)    — the small side, broadcast
    * @return (query_id, neighbor_id, cosine, rank), rank 1..k.
    *         Ranking uses the ROUNDED score (4 dp) with the neighbor id
    *         as tiebreak, making top-k deterministic under floating-
    *         point noise.
    */
  def topK(corpus: DataFrame, queries: DataFrame, idCol: String, vecCol: String,
      k: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val joinCond =
      if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val scored = c.join(broadcast(q), joinCond)
      .select(col("query_id"), col("neighbor_id"),
        // integer-scaled rounding — see Dedup.ngramJaccardPairs
        (round(cosineF(col("qv"), col("cv")) * lit(10000.0)) / 1e4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** k-NN GRAPH construction — every vector's k nearest within its
    * coarse block (cluster id / label / quantizer cell): the self-join
    * primitive behind SemDeDup-style semantic dedup, kNN-LM retrieval
    * sets and dataset-cartography neighborhoods. Where [[topK]] serves
    * a bounded query set against the corpus, this builds the
    * all-vectors graph — so candidates MUST come from a block-equality
    * join (per-block work Σ block², never N² — the
    * [[Dedup.embeddingCosinePairs]] trade, and at production scale the
    * block key is an IVF/quantizer assignment sized to keep blocks
    * bounded). Output (vec_id, neighbor_id, cosine, rank ≤ k), both
    * directions — kNN is asymmetric, so the graph is directed.
    * Ranking uses the rounded score (4 dp) with the neighbor-id
    * tiebreak, deterministic under IEEE noise.
    *
    * Scale shape: the keyed frame is materialized once and self-joins
    * on the block key; the per-vector window shuffles only
    * (vec_id, neighbor_id, cosine) — vectors never ride the ranking
    * shuffle. */
  def knnGraph(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, k: Int, maxBlock: Int = Int.MaxValue): DataFrame = {
    require(k >= 1, "k must be >= 1")
    // materialized: both self-join sides read it (see
    // Dedup.ngramJaccardPairs; persist(DISK_ONLY) on a cluster)
    val keyed = df.select(col(blockCol).as("b"), col(idCol).as("id"),
      col(vecCol).as("v")).localCheckpoint()
    if (maxBlock != Int.MaxValue) {
      // bounded 1-row probe of the just-materialized frame (the
      // SemDedup.maxCluster posture): a hot block makes the self-join
      // quadratic IN THAT BLOCK — fail loudly before the join runs
      val hot = keyed.groupBy("b").agg(count(lit(1)).as("__n"))
        .filter(col("__n") > maxBlock)
        .orderBy(col("__n").desc).limit(1).collect()
      if (hot.nonEmpty) throw new IllegalStateException(
        s"knnGraph: block ${hot.head.get(0)} holds ${hot.head.getLong(1)} " +
          s"vectors (> maxBlock=$maxBlock); the candidate self-join would " +
          "be quadratic in that block. Use a finer block key (an " +
          "IVF/quantizer assignment sized to the corpus) or raise " +
          "maxBlock explicitly")
    }
    val scored = keyed.as("a").join(keyed.as("c"),
        col("a.b") === col("c.b") && col("a.id") =!= col("c.id"))
      .select(col("a.id").as("vec_id"), col("c.id").as("neighbor_id"),
        // integer-scaled rounding — see Dedup.ngramJaccardPairs
        (round(cosineF(col("a.v"), col("c.v")) * lit(10000.0)) / 1e4)
          .as("cosine"))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Contrastive TRIPLET mining over the [[knnGraph]] — the
    * training-set construction step for embedding/reranker models
    * (SimCSE/E5-style mined pairs): per anchor, positive = its
    * nearest in-block neighbor, hard negative = the first neighbor at
    * `rank ≥ negFromRank` whose cosine sits at least `margin` BELOW
    * the positive's (similar enough to be informative, provably not
    * the duplicate band — the rank offset plus score margin is the
    * standard guard against false negatives). Anchors with no
    * qualifying negative drop: a triplet set with weak negatives
    * poisons the loss, so under-emitting is the correct failure mode.
    *
    * Determinism: cosines are 4-dp-rounded with the id tiebreak (the
    * [[knnGraph]] contract), and the margin test runs in that rounded
    * space, so the mined set is bit-stable across engines and layouts.
    *
    * Scale shape: ONE knn pass, materialized once (two consumers);
    * `pos` is a filter of the same vec_id-partitioned frame, so the
    * join back adds no exchange, and the negative pick is a min-struct
    * agg on the ≤k-row-per-anchor frame — nothing data-sized moves
    * beyond the knn self-join itself (whose block-equality Σ block²
    * bound is the [[knnGraph]] contract). */
  def mineTriplets(df: DataFrame, idCol: String, vecCol: String,
      blockCol: String, k: Int = 5, negFromRank: Int = 3,
      margin: Double = 0.05, maxBlock: Int = Int.MaxValue): DataFrame = {
    require(negFromRank >= 2 && negFromRank <= k,
      s"negFromRank must be in [2, k=$k], got $negFromRank")
    require(margin >= 0.0, "margin must be non-negative")
    val g = knnGraph(df, idCol, vecCol, blockCol, k, maxBlock).localCheckpoint()
    val pos = g.filter(col("rank") === 1)
      .select(col("vec_id"), col("neighbor_id").as("positive_id"),
        col("cosine").as("pos_cosine"))
    g.join(pos, "vec_id")
      .filter(col("rank") >= negFromRank &&
        col("cosine") <= col("pos_cosine") - margin)
      .groupBy(col("vec_id"), col("positive_id"), col("pos_cosine"))
      .agg(min(struct(col("rank"), col("neighbor_id"), col("cosine"))).as("n"))
      .select(col("vec_id").as("anchor_id"), col("positive_id"),
        col("pos_cosine"), col("n.neighbor_id").as("negative_id"),
        col("n.cosine").as("neg_cosine"))
  }

  /** Two-phase quantized ANN: candidates are scored on int8-QUANTIZED
    * vectors (¼ the scan/shuffle bandwidth of float32 — the production
    * reason [[VectorQuant]] exists), then exact float cosine re-ranks
    * only the `k·candidateFactor` survivors per query. The standard
    * quantize-then-rerank recipe, and — unlike sketch/cluster ANN —
    * deterministic AND oracle-replayable end to end: the quantized
    * bytes are the explicit `floor(x·scale + 0.5)` (bit-identical in
    * any engine), the candidate score is a ratio of integer dot
    * products that are exact in doubles (|q| ≤ 127 ⇒ Σ products ≪
    * 2⁵³, so summation order cannot matter), and both rankings carry
    * the neighbor-id tiebreak. Zero-norm vectors score a −2.0
    * sentinel (below any cosine) instead of NaN, keeping ordering
    * well-defined in every engine.
    *
    * Plan shape matches [[topK]]: queries broadcast, corpus scanned
    * in place, ONE window per phase over |queries|·bounded rows — and
    * the candidate window shuffles ONLY (query_id, neighbor_id,
    * score): the float vectors are joined back AFTER candidate
    * selection (queries re-broadcast; the ≤ |queries|·k·factor
    * candidate frame broadcast against an unshuffled second corpus
    * scan). Keeping the floats out of the |corpus|×|queries| scored
    * frame is the point of scanning quantized — carrying them through
    * the window shuffle (the pre-r9 shape) paid float32 shuffle
    * bandwidth for every scored pair. The interpreted
    * `aggregate`/`zip_with` int dot is fine at catalog scale; the
    * 100 TB upgrade is a codegen'd int8 dot expression in the
    * [[graft.functions.DotProductFloat]] mold. */
  def topKQuantizedRerank(corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int, candidateFactor: Int = 4,
      excludeSelf: Boolean = true): DataFrame = {
    require(k >= 1 && candidateFactor >= 1, "k and candidateFactor must be ≥ 1")
    import org.apache.spark.sql.Column
    // Σ aᵢ·bᵢ over int8 arrays — exact in 64-bit (and in the oracle's
    // doubles: every partial is an integer ≪ 2^53)
    def qdot(a: Column, b: Column): Column =
      aggregate(zip_with(a, b, (x, y) => x.cast("long") * y.cast("long")),
        lit(0L), (acc, x) => acc + x)
    // int8 + id ONLY — the scan/shuffle frame never carries floats
    val c = VectorQuant.withQuantized(
        corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "cv", scaleCol = "__cs", qCol = "cq")
      .select("neighbor_id", "cq")
    val q = VectorQuant.withQuantized(
        queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")),
        "qv", scaleCol = "__qs", qCol = "qq")
      .select("query_id", "qq")
    val self = if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val cn = qdot(col("cq"), col("cq"))
    val qn = qdot(col("qq"), col("qq"))
    val scored = c.join(broadcast(q), self)
      .select(col("query_id"), col("neighbor_id"),
        when(cn > 0 && qn > 0,
          qdot(col("cq"), col("qq")).cast("double") /
            (sqrt(cn.cast("double")) * sqrt(qn.cast("double"))))
          .otherwise(lit(-2.0)).as("__cos_q"))
    val wq = Window.partitionBy(col("query_id"))
      .orderBy(col("__cos_q").desc, col("neighbor_id").asc)
    val candidates = scored.withColumn("__crk", row_number().over(wq))
      .filter(col("__crk") <= k * candidateFactor)
      .select("query_id", "neighbor_id")
    // floats join back for the bounded survivor set only: candidates ≤
    // |queries|·k·factor by construction (caller-controlled constants),
    // so the candidate side broadcasts and the corpus is re-scanned —
    // a scan, not a shuffle — for its vectors
    val rescored = broadcast(candidates
        .join(broadcast(queries.select(col(idCol).as("query_id"),
          col(vecCol).as("qv"))), "query_id"))
      .join(corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")),
        "neighbor_id")
      // exact float re-rank — same rounded cosine + tiebreak as topK
      .select(col("query_id"), col("neighbor_id"),
        (round(cosineF(col("qv"), col("cv")) * lit(10000.0)) / 1e4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    rescored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** IVF-style blocked top-k: only corpus rows sharing `blockCol` with
    * the query are scored. With B balanced blocks this does |corpus|/B
    * of the brute-force work per query — the standard inverted-file
    * trade of recall for throughput. */
  def topKBlocked(corpus: DataFrame, queries: DataFrame, idCol: String,
      vecCol: String, blockCol: String, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("neighbor_id"), col(blockCol).as("blk"), col(vecCol).as("cv"))
    val q = queries.select(col(idCol).as("query_id"), col(blockCol).as("qblk"), col(vecCol).as("qv"))
    val self = if (excludeSelf) col("query_id") =!= col("neighbor_id") else lit(true)
    val scored = c.join(broadcast(q), col("blk") === col("qblk") && self)
      .select(col("query_id"), col("neighbor_id"),
        // integer-scaled rounding — see Dedup.ngramJaccardPairs
        (round(cosineF(col("qv"), col("cv")) * lit(10000.0)) / 1e4).as("cosine"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("neighbor_id").asc)
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Reciprocal-rank fusion (Cormack, Clarke & Büttcher SIGIR 2009)
    * of N independent retrieval rankings — the standard hybrid-search
    * combiner (lexical BM25/Jaccard ⊕ dense-vector cosine) precisely
    * BECAUSE it reads only ranks: no cross-system score calibration,
    * so two engines whose scores live on incomparable scales fuse
    * cleanly. score(d) = Σ_lists 1/(rrfK + rank_list(d)), summed over
    * the lists that ranked d at all.
    *
    * Determinism: each contribution is integer-scaled BEFORE the sum —
    * `round(10⁶ / (rrfK + rank))` is one correctly-rounded IEEE
    * division of exact integers rounded to an exact long (no divisor
    * in a plausible rank range lands the true quotient near an .5
    * boundary), so the per-doc sum is order-independent and the final
    * ranking (scaled sum DESC, doc ASC) is engine-exact — the
    * [[graft.ext.Dedup.ngramJaccardPairs]] 4-dp discipline applied to
    * rank space.
    *
    * Scale shape: each input ranking is already top-k-per-query
    * (bounded: |queries|·k rows), so the union + one hash aggregate +
    * one per-query window run over tiny frames regardless of corpus
    * size — the heavy lifting happened inside the per-modality
    * retrievers, which is exactly where a 100 TB deployment wants it.
    *
    * @param rankings frames with (query_id, doc_id, rank), rank 1-based
    * @return (query_id, doc_id, n_lists, fused_rank, rrf_score),
    *         fused_rank 1..topN per query */
  def rrfFuse(rankings: Seq[DataFrame], rrfK: Int = 60,
      topN: Int = 10): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking to fuse")
    val contribs = rankings.map(_.select(col("query_id"), col("doc_id"),
        round(lit(1000000.0) / (lit(rrfK) + col("rank"))).cast("long").as("__c")))
      .reduce(_.unionByName(_))
    val fused = contribs.groupBy("query_id", "doc_id")
      .agg(count(lit(1)).as("n_lists"), sum(col("__c")).as("__s"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("__s").desc, col("doc_id").asc)
    fused.withColumn("fused_rank", row_number().over(w))
      .filter(col("fused_rank") <= topN)
      .select(col("query_id"), col("doc_id"), col("n_lists"),
        col("fused_rank"), (col("__s").cast("double") / 1e6).as("rrf_score"))
  }
}
