package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Coreness (k-core decomposition) per node — the density-robustness
  * statistic a curation pipeline reads off its knn / link graphs: a
  * node's coreness is the largest k such that it survives in the
  * subgraph where every node keeps ≥ k neighbors, i.e. how deep the
  * node sits inside a mutually-dense region. Near-dup clusters and
  * template farms form high-core neighborhoods even when triangle
  * counts are diluted; crawl-frontier spam rings are classically
  * high-core/low-pagerank. Completes the graph-statistic family next
  * to [[PageRank]] (centrality), [[LabelPropagation]] (communities),
  * [[TriangleCount]] (local clustering) and
  * [[ConnectedComponents]] (reachability).
  *
  * Algorithm: the ITERATED H-INDEX operator (Lü et al. 2016, "The
  * H-index of a network node and its relation to degree and
  * coreness"): start from c₀ = degree and repeat
  * c_{t+1}(v) = H({c_t(u) : u ∈ N(v)}) — the largest h such that at
  * least h neighbors currently score ≥ h. From the degree start the
  * sequence is monotonically non-increasing and converges EXACTLY to
  * coreness; the sequential peel (remove min-degree nodes one at a
  * time) is inherently serial, while the h-operator is synchronous
  * and embarrassingly parallel — the distributed formulation of
  * choice. A FIXED round count is the contract (the [[PageRank]] /
  * [[LabelPropagation]] posture): values after `iterations` rounds
  * are the result, converged or not — deterministic under any
  * partitioning, replayable as the oracle's unrolled CTE chain
  * (KCoreSpec asserts the fixpoint is actually reached on the
  * catalog graph, so the cap is slack, not error).
  *
  * Scale shape: the symmetrized adjacency is materialized once and
  * re-read each round; a round is one equality join of the score
  * table onto the edge list, one per-node descending scan
  * (`row_number` window — partitions are single-node neighbor lists,
  * bounded by max degree, NOT the global row space) for
  * H = max(min(score, rank)), and one per-node reduce — all linear
  * in |edges| with a fixed round count. The h-value is invariant to
  * row_number tie order among equal scores (within a tie block the
  * score is constant and the rank set is fixed, so the min-pair
  * multiset — hence its max — never moves), so no tiebreak column is
  * needed for engine agreement.
  */
object KCore {

  /** @param edges edge list, treated as UNDIRECTED (symmetrized
    *              internally; self-loops and duplicate edges collapse)
    * @return one row per node appearing in `edges`:
    *         (node, coreness) — the h-operator value after
    *         `iterations` synchronous rounds from the degree start
    *         (= exact coreness once converged). */
  def coreness(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 8): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint()
    // c0 = undirected degree (every node in `und` has ≥ 1 neighbor)
    var scores = und.groupBy("a").agg(count(lit(1)).as("c"))
      .select(col("a").as("node"), col("c"))
    for (i <- 1 to iterations) {
      val h = hRound(und, scores)
      // least() pins the monotone descent explicitly (true from the
      // degree start anyway) so a partial run is always a valid
      // upper bound on coreness
      scores = scores
        .join(h.select(col("a").as("node"), col("h")), Seq("node"), "left_outer")
        .select(col("node"),
          least(col("c"), coalesce(col("h"), col("c"))).as("c"))
      // lineage truncation cadence — see PageRank.runTyped
      if (i % 3 == 0 || i == iterations) scores = scores.localCheckpoint()
    }
    scores.withColumnRenamed("c", "coreness")
  }

  /** One synchronous h-operator round: join scores onto the
    * symmetrized adjacency, per-node descending `row_number` window
    * (partitions are single-neighbor-lists, bounded by max degree),
    * reduce to H = max(min(score, rank)). Exposed so PlanShapeSpec
    * can pin the ROUND plan — the iteration checkpoints each round,
    * so the final frame's executed plan is a bare materialized scan. */
  private[graft] def hRound(und: DataFrame, scores: DataFrame): DataFrame =
    und
      .join(scores.select(col("node").as("b"), col("c").as("cb")), "b")
      .select(col("a"), col("cb"))
      .withColumn("rn", row_number().over(
        Window.partitionBy("a").orderBy(col("cb").desc)))
      .groupBy("a").agg(max(least(col("cb"), col("rn"))).as("h"))
}
