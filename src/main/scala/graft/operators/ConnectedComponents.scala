package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the entity-resolution /
  * dedup-grouping primitive (near-dup pairs → duplicate groups, id
  * graphs → canonical entities). Spark has no built-in; this is
  * min-label propagation (the same star-contraction loop
  * [[graft.ext.Dedup.minhashClusters]] runs over doc–bucket bipartite
  * graphs, generalized to an arbitrary edge list).
  *
  * Per round: every node takes the minimum label among itself and its
  * neighbors — two hash-key shuffles over |edges| rows. Labels
  * converge in O(diameter) rounds (real dup/identity graphs are
  * shallow); each round's labels are `localCheckpoint`ed so plan depth
  * stays constant (a cluster deployment would persist to disk), and
  * the loop exits early at fixpoint via a changed-flag scan of that
  * checkpointed frame (the flag is computed inside the round's own
  * join, so the probe costs no extra shuffle). Output is one
  * (node, label) row per node that appears in any edge; label = the
  * minimum node id reachable from it. Deterministic for a given edge
  * set regardless of partitioning.
  *
  * If the fixpoint is NOT reached within `maxIters` rounds, [[run]]
  * THROWS (`IllegalStateException`) rather than returning labels that
  * look valid but merge nothing beyond radius `maxIters` — a silent
  * wrong answer is the one failure mode a dedup pipeline can't detect
  * downstream. Callers that want partial labels opt in explicitly via
  * [[runWithStatus]], which returns the labels plus a `converged` flag.
  */
object ConnectedComponents {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 10): DataFrame = {
    val (labels, converged, iters) = runWithStatus(edges, srcCol, dstCol, maxIters)
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $iters rounds: a component " +
        s"with eccentricity > $maxIters from its min-id node exists; raise " +
        "maxIters (rounds needed = graph diameter) or use runWithStatus to " +
        "accept partial labels explicitly")
    labels
  }

  /** [[run]] without the convergence gate: returns (labels, converged,
    * roundsUsed). Labels are only exact when `converged` is true. */
  def runWithStatus(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 10): (DataFrame, Boolean, Int) = {
    require(maxIters > 0, "maxIters must be positive")
    // materialize the edge list BEFORE symmetrizing: the union reads it
    // twice, and `edges` is often an expensive upstream (e.g. the n-gram
    // pair join) that must not evaluate once per side
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint()
    // symmetrize once: propagation below only follows a→b edges
    val sym = e
      .unionByName(e.select(col("b").as("a"), col("a").as("b")))
      .distinct()
      .localCheckpoint()
    var labels = sym.select(col("a").as("node")).distinct()
      .withColumn("label", col("node"))
      .localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("node", "b"), "b")
        .groupBy(col("a").as("node"))
        .agg(min("label").as("nmin"))
      // the join that builds `next` already sees (label, nmin), so the
      // per-node changed flag rides along and the fixpoint probe is a
      // scan of the checkpointed frame — not a second shuffle join of
      // next against labels per round
      val next = labels.join(neighborMin, Seq("node"), "left_outer")
        .select(col("node"),
          least(col("label"), coalesce(col("nmin"), col("label"))).as("label"),
          (coalesce(col("nmin"), col("label")) < col("label")).as("__changed"))
        .localCheckpoint()
      converged = next.filter(col("__changed")).isEmpty
      labels = next.drop("__changed")
      i += 1
    }
    (labels, converged, i)
  }
}
