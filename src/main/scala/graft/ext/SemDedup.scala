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
  * The keep policy is ALSO a deliberate deviation from the paper:
  * SemDeDup keeps the cluster member with the LOWEST cosine to the
  * k-means centroid; here the kept member is the min-id
  * connected-component representative — deterministic, id-stable
  * under re-runs, and independent of centroid quality, at the cost of
  * not preferring the "most typical" member.
  *
  * Scale shape, stage by stage at corpus size N with k clusters
  * (SemDeDup mandates k SCALE WITH THE CORPUS — k ≈ N/10⁴, ~50k
  * clusters for 600M docs — to keep per-cluster pair work constant):
  *   - centers: one TakeOrdered scan (k rows kept per partition);
  *   - assignment ([[assignTwoLevel]]): two-level argmax so compute is
  *     O(N·(√k + k/√k)·d) = O(N·√k·d), not the flat O(N·k·d) that
  *     turns quadratic once k ∝ N. Only the √k super-centers are ever
  *     broadcast; the k full centers travel through a super-id
  *     EQUALITY join (shuffle-sized, never a broadcast or a cross
  *     product — see the method doc);
  *   - pair search: Σ|cluster|² ≈ N²/k cosine verifies through the
  *     cluster-equality join ([[Dedup.embeddingCosinePairs]]);
  *   - grouping: [[ConnectedComponents]] over the (sparse) dup pairs,
  *     linear output, O(log n) contraction rounds.
  */
object SemDedup {

  /** Flat deterministic coarse-quantizer assignment: every vector
    * labeled with its argmax-cosine center out of the `nCenters`
    * min-md5(id) corpus vectors. Returns (id, cluster, v).
    *
    * O(N·k·d) compute and an O(k·d) broadcast — fine for fixed small
    * k (≲ 10³), quadratic once k scales with the corpus. Production
    * paths use [[assignTwoLevel]]; this flat form is kept as the
    * semantics reference the two-level spec proves equivalence
    * against on unambiguous fixtures. */
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

  /** Two-level deterministic quantizer assignment — same md5/argmax/
    * 4-dp-integer construction as [[assign]], restructured so neither
    * compute nor broadcast grows linearly in k:
    *
    *   1. supers: the ⌈√k⌉ smallest-md5 centers (a PREFIX of the
    *      center draw — supers ⊆ centers by construction);
    *   2. each center argmax-assigns to a super (k×√k, tiny), with
    *      ties preferring ITSELF when the center is a super — the
    *      guarantee that every super's bucket contains at least the
    *      super, so no corpus vector's bucket is empty;
    *   3. each corpus vector argmax-assigns to a super (N×√k over a
    *      √k-row broadcast), then scans ONLY that super's bucket of
    *      centers through a super-id EQUALITY join (avg bucket ≈ √k).
    *
    * Compute O(N·√k·d); the only broadcast is the √k-row super frame.
    * The level-2 join carries k center rows with NO static hint: at
    * catalog scale AQE broadcasts them, at production k·d it exceeds
    * the broadcast threshold and Spark shuffles both sides on
    * super_id — ~√k distinct keys, which AQE's skew-join splitting
    * rebalances (the corpus side of an SMJ splits per-partition).
    * Three N-row shuffles (two argmax groupBys + the bucket join)
    * buy a k/√k ≈ 224× compute cut at SemDeDup's 600M-doc scale.
    *
    * Assignment may differ from [[assign]] where a vector's true
    * argmax center sits in a different super's bucket — immaterial
    * for dedup blocking (near-identical vectors still co-locate by
    * continuity: identical scores → identical bucket walk), proven
    * equivalent on separated fixtures by SemDedupSpec. */
  def assignTwoLevel(df: DataFrame, idCol: String, vecCol: String,
      nCenters: Int): DataFrame = {
    require(nCenters > 0, "nCenters must be positive")
    val nSuper = math.ceil(math.sqrt(nCenters.toDouble)).toInt
    val v = df.select(col(idCol).as("id"), col(vecCol).as("v"))
    // MATERIALIZED: feeds the super prefix and the center→super cross
    // join (a cluster deployment persists DISK_ONLY instead)
    val centers = v
      .orderBy(md5(col("id").cast("string")).asc, col("id").asc)
      .limit(nCenters)
      .select(col("id").as("center_id"), col("v").as("cv"))
      .localCheckpoint()
    val supers = centers
      .orderBy(md5(col("center_id").cast("string")).asc, col("center_id").asc)
      .limit(nSuper)
      .select(col("center_id").as("super_id"), col("cv").as("sv"))
    // center → super: argmax cosine, ties prefer self then min id
    val centerSuper = centers.crossJoin(broadcast(supers))
      .select(col("center_id"), col("cv"), col("super_id"),
        round(cosineF(col("cv"), col("sv")) * lit(10000.0)).cast("long").as("s"),
        when(col("super_id") === col("center_id"), 0).otherwise(1).as("not_self"))
      .groupBy("center_id")
      .agg(min(struct((-col("s")).as("ns"), col("not_self").as("nself"),
        col("super_id").as("sid"), col("cv").as("cvv"))).as("best"))
      .select(col("best.sid").as("super_id"), col("center_id"),
        col("best.cvv").as("cv"))
    // level 1: corpus → super (the ONLY corpus-wide broadcast, √k rows)
    val withSuper = v.crossJoin(broadcast(supers))
      .select(col("id"), col("v"), col("super_id"),
        round(cosineF(col("v"), col("sv")) * lit(10000.0)).cast("long").as("s"))
      .groupBy("id")
      .agg(min(struct((-col("s")).as("ns"),
        col("super_id").as("sid"), col("v").as("vv"))).as("best"))
      .select(col("id"), col("best.sid").as("super_id"), col("best.vv").as("v"))
    // level 2: argmax over the vector's super bucket only — equality
    // join, deliberately unhinted (AQE broadcasts small, shuffles big)
    withSuper.join(centerSuper, "super_id")
      .select(col("id"), col("v"), col("center_id"),
        round(cosineF(col("v"), col("cv")) * lit(10000.0)).cast("long").as("s"))
      .groupBy("id")
      .agg(min(struct((-col("s")).as("ns"),
        col("center_id").as("c"), col("v").as("vv"))).as("best"))
      .select(col("id"), col("best.c").as("cluster"), col("best.vv").as("v"))
  }

  /** Per-vector semantic-dedup verdict: (id, cluster, dup_label,
    * is_keep). `cluster` is the assigned coarse center's id,
    * `dup_label` the connected-component representative among
    * duplicates (self for singletons), `is_keep` true exactly for the
    * one kept member of each duplicate group (the min id — see the
    * object doc on the deviation from the paper's keep rule).
    *
    * `threshold` is the cosine above which two same-cluster vectors
    * are duplicates, compared in the 4-dp integer space the whole
    * vector family rounds to ([[Dedup.embeddingCosinePairs]]).
    *
    * `maxCluster` is the hot-cluster guard: the pair search is
    * Σ|cluster|², so ONE degenerate cluster (an embedding-collapse
    * artifact, or a quantizer under-provisioned for the corpus — k
    * must scale ~N/10⁴) turns the whole operator quadratic. When any
    * cluster exceeds the cap the operator THROWS before the pair join
    * runs (one map-side-combined size aggregate, linear) rather than
    * either grinding through the quadratic regime or silently
    * skipping the dense region — un-deduplicated dense space is
    * exactly the wrong thing to ship quietly (the
    * [[graft.operators.ConnectedComponents]] non-convergence
    * posture). Exact duplicates should be removed by the cheap
    * fingerprint pass BEFORE semantic dedup; a legitimate dense
    * region needs a larger `nCenters`.
    */
  def semanticDedup(df: DataFrame, idCol: String, vecCol: String,
      nCenters: Int, threshold: Double,
      maxCluster: Int = Int.MaxValue): DataFrame = {
    // MATERIALIZED: feeds both sides of the pair self-join plus the
    // final verdict join (see ngramJaccardPairs; a cluster deployment
    // persists DISK_ONLY instead)
    val assigned = assignTwoLevel(df, idCol, vecCol, nCenters).localCheckpoint()
    if (maxCluster != Int.MaxValue) {
      val hot = assigned.groupBy("cluster").agg(count(lit(1)).as("n"))
        .filter(col("n") > maxCluster)
        .orderBy(col("n").desc).limit(1).collect()
      if (hot.nonEmpty) throw new IllegalStateException(
        s"semanticDedup: cluster ${hot.head.get(0)} holds ${hot.head.getLong(1)} " +
          s"vectors (> maxCluster=$maxCluster); the pair search would be " +
          "quadratic in that cluster. Run exact/fingerprint dedup first, " +
          "raise nCenters (k must scale with the corpus, ~N/1e4), or raise " +
          "maxCluster explicitly")
    }
    val pairs = Dedup.embeddingCosinePairs(assigned, "id", "v", "cluster", threshold)
    val labels = ConnectedComponents.run(pairs, "id_a", "id_b")
    assigned
      .join(labels.withColumnRenamed("node", "id"), Seq("id"), "left_outer")
      .select(col("id").as(idCol), col("cluster"),
        coalesce(col("label"), col("id")).as("dup_label"),
        (coalesce(col("label"), col("id")) === col("id")).as("is_keep"))
  }
}
