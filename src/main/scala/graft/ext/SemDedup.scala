package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.VectorMath.cosineF
import graft.operators.ConnectedComponents

/** SemDeDup-style semantic deduplication (Abbas et al. 2023,
  * arXiv:2303.09540): coarse-cluster the embedding space, call
  * within-cluster pairs whose cosine exceeds a threshold semantic
  * duplicates, and keep one representative per duplicate group. The
  * operator the exact/minhash family cannot replace: paraphrases and
  * re-renders share no shingles but sit next to each other in
  * embedding space.
  *
  * The published algorithm quantizes with k-means. Here the coarse
  * quantizer is DETERMINISTIC and engine-portable — centers are the
  * `nCenters` corpus vectors with the smallest md5(id) (a stable
  * uniform draw, the [[Splits]] discipline), assignment is argmax
  * cosine — so the whole pipeline replays bit-for-bit in the SQL
  * oracle, unlike k-means whose centroids are engine-specific
  * ([[Ivf]] carries a recall bound instead of a hash for exactly that
  * reason). Center quality matters less than it does for ANN search:
  * clusters only BLOCK the pair search, and any assignment that puts
  * near-identical vectors together (argmax cosine puts them with the
  * same center by continuity) preserves the duplicate groups.
  *
  * Scale shape, stage by stage at corpus size N:
  *   - centers: one TakeOrdered scan (k rows kept per partition);
  *   - assignment: broadcast cross-join N×k with the argmax folded
  *     into a map-side-combined `min(struct)` aggregate — the blocked
  *     self-join below needs (id, cluster, vec) co-shuffled anyway,
  *     so the argmax shuffle IS the co-location shuffle, N rows wide;
  *   - pair search: Σ|cluster|² ≈ N²/k cosine verifies through the
  *     cluster-equality join ([[Dedup.embeddingCosinePairs]]) — k is
  *     the quadratic-control knob and must SCALE WITH THE CORPUS
  *     (SemDeDup runs k ≈ N/10⁴: ~50k clusters for 600M docs), which
  *     keeps per-cluster work constant as N grows;
  *   - grouping: [[ConnectedComponents]] over the (sparse) dup pairs,
  *     linear output.
  */
object SemDedup {

  /** Deterministic coarse-quantizer assignment: every vector labeled
    * with its argmax-cosine center out of the `nCenters` min-md5(id)
    * corpus vectors. Returns (id, cluster, v) — the blocking frame
    * [[semanticDedup]] pairs within, and the grouping frame
    * cluster-balanced sampling caps over. */
  def assign(df: DataFrame, idCol: String, vecCol: String,
      nCenters: Int): DataFrame = {
    require(nCenters > 0, "nCenters must be positive")
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // deterministic coarse centers: k smallest md5(id); the id
    // tiebreak makes selection total even under (astronomically
    // unlikely) digest collisions
    val centers = v
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      .limit(nCenters)
      .select(col("id").as("center_id"), col("v").as("cv"))
    // argmax-cosine assignment: cosine in rounded 4-dp integer space
    // (portable — see Dedup.ngramJaccardPairs on why scaled-integer
    // round is the cross-engine-safe form), ties to the smallest
    // center id. min(struct(-score, center, vec)) carries the vector
    // through the one N-row shuffle instead of re-joining the corpus.
    val scored = v.crossJoin(broadcast(centers))
      .select(col("id"), col("v"), col("center_id"),
        round(cosineF(col("v"), col("cv")) * lit(10000.0)).cast("long").as("s"))
    scored.groupBy("id")
      .agg(min(struct((-col("s")).as("ns"),
        col("center_id").as("c"), col("v").as("vv"))).as("best"))
      .select(col("id"), col("best.c").as("cluster"), col("best.vv").as("v"))
  }

  /** Per-vector semantic-dedup verdict: (id, cluster, dup_label,
    * is_keep). `cluster` is the assigned coarse center's id,
    * `dup_label` the connected-component representative among
    * duplicates (self for singletons), `is_keep` true exactly for the
    * one kept member of each duplicate group.
    *
    * `threshold` is the cosine above which two same-cluster vectors
    * are duplicates, compared in the 4-dp integer space the whole
    * vector family rounds to ([[Dedup.embeddingCosinePairs]]).
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nCenters: Int, threshold: Double): DataFrame = {
    // MATERIALIZED: feeds both sides of the pair self-join plus the
    // final verdict join (see ngramJaccardPairs; a cluster deployment
    // persists DISK_ONLY instead)
    val assigned = assign(df, idCol, vecCol, nCenters).localCheckpoint()
    val pairs = Dedup.embeddingCosinePairs(assigned, "id", "v", "cluster", threshold)
    val labels = ConnectedComponents.run(pairs, "id_a", "id_b")
    assigned
      .join(labels.withColumnRenamed("node", "id"), Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("label"), col("id")).as("dup_label"),
        (coalesce(col("label"), col("id")) === col("id")).as("is_keep"))
  }
}
