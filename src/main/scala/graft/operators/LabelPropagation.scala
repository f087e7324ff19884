package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Fixed-round synchronous label propagation (Raghavan et al. 2007) —
  * the community-detection primitive a curation pipeline runs over its
  * knn / link graphs: near-dup neighborhoods, topical clusters for
  * mixture design, crawl-graph communities for domain sampling.
  * Complements [[ConnectedComponents]] (LPA splits a connected graph
  * into densely-linked regions; components only find disconnected
  * ones) and [[PageRank]] (centrality, not grouping).
  *
  * DETERMINISM — the published algorithm breaks count ties randomly
  * and updates asynchronously; both choices are non-reproducible
  * across partitionings, so this implementation fixes them: updates
  * are SYNCHRONOUS (round r+1 reads only round r's labels) and the
  * per-node winner is the neighbor label maximizing (count, then
  * MIN label) — exact integer counts, so every engine and every
  * partitioning agrees bit-for-bit, and the result is replayable in
  * portable SQL (the oracle's fixed CTE chain). The cost of
  * determinism is the known oscillation mode of synchronous LPA on
  * bipartite-ish regions; a FIXED round count (the contract, like
  * [[PageRank]]'s) bounds it — labels after `iterations` rounds are
  * the result, converged or not.
  *
  * Scale shape: the symmetrized adjacency is materialized ONCE
  * (`localCheckpoint`; persist(DISK_ONLY) on a cluster) and re-read
  * each round; a round is one equality join of the label table onto
  * the edge list + one (node, label) count aggregate (map-side
  * combinable) + one min-struct reduce per node — two shuffles of
  * |edges| / |nodes| rows, zero windows, linear per round with a
  * fixed round count. Labels ride as the node key's own type; no
  * dense-id remap (the [[PageRank.runTyped]] rule).
  */
object LabelPropagation {

  /** @param edges edge list, treated as UNDIRECTED (symmetrized
    *              internally; self-loops and duplicate edges collapse)
    * @return one row per node appearing in `edges`:
    *         (node, community) — community = the label (a node id)
    *         the node carries after `iterations` synchronous rounds;
    *         isolated nodes (self-loops only) keep their own id */
  def run(edges: DataFrame, srcCol: String, dstCol: String,
      iterations: Int = 5): DataFrame = {
    require(iterations >= 1, "iterations must be >= 1")
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val nodes = e.select(col("a").as("node"))
      .union(e.select(col("b").as("node")))
      .distinct().localCheckpoint()
    // one undirected vote per distinct neighbor pair: duplicate edges
    // would double-vote and make the result multiplicity-sensitive
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint()
    var labels = nodes.withColumn("label", col("node"))
    for (i <- 1 to iterations) {
      val votes = und
        .join(labels.select(col("node").as("b"), col("label")), "b")
        .groupBy(col("a").as("node"), col("label"))
        .agg(count(lit(1)).as("c"))
      // winner = max count, then min label: lexicographic min over
      // (-count, label) — a two-level hash aggregate with map-side
      // partials, where the textbook row_number window would shuffle
      // and sort every (node, label) row
      val winners = votes.groupBy("node")
        .agg(min(struct((-col("c")).as("nc"), col("label").as("l"))).as("w"))
        .select(col("node"), col("w.l").as("label"))
      // isolated nodes have no votes: they keep their current label
      labels = labels.select(col("node"), col("label").as("__prev"))
        .join(winners, Seq("node"), "left_outer")
        .select(col("node"), coalesce(col("label"), col("__prev")).as("label"))
      // lineage truncation cadence — see PageRank.runTyped
      if (i % 3 == 0 || i == iterations) labels = labels.localCheckpoint()
    }
    labels.withColumnRenamed("label", "community")
  }
}
