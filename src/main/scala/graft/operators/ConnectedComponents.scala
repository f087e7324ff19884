package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an edge list — the entity-resolution /
  * dedup-grouping primitive (near-dup pairs → duplicate groups, id
  * graphs → canonical entities). Spark has no built-in; this is
  * alternating large-star / small-star contraction (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC 2014), which
  * converges in O(log n) rounds REGARDLESS OF DIAMETER — the property
  * plain min-label propagation lacks (O(diameter) rounds, so a
  * chain-shaped dup cluster at crawl scale would exhaust any fixed
  * round budget; r9 VERDICT #3).
  *
  * Per round, over the canonical (hi → lo) edge set:
  *   - large-star: every node u computes m = min({u} ∪ N(u)) and
  *     rewires each strictly-larger neighbor to m — long tails fold
  *     onto their local minimum in one hop;
  *   - small-star: every hi-node rewires its ≤-neighbors (and itself)
  *     to their minimum — stars flatten onto the component minimum.
  * Each is one hash-shuffle groupBy + one equality join over |edges|
  * rows, linear per round; round frames are `localCheckpoint`ed so
  * plan depth stays constant (a cluster deployment persists to a
  * checkpoint dir instead). The loop exits the moment a round's output
  * IS a min-rooted star forest — the exact fixpoint set of both
  * operators — tested structurally on the (distinct) canonical set:
  * every h-node occurs in exactly one edge and no h-node is also an
  * l-node ⇔ disjoint min-centered stars. Both operators preserve
  * connectivity exactly, so the stars of that state are the original
  * components. Two cheap scans of the just-materialized frame,
  * instead of set-equality probes against the previous round (which
  * also burn one extra full round merely to OBSERVE the fixpoint).
  *
  * Output is one (node, label) row per node that appears in any input
  * edge (self-loops count as appearances but propagate nothing);
  * label = the minimum node id reachable from it. Deterministic for a
  * given edge set regardless of partitioning.
  *
  * If the fixpoint is NOT reached within `maxIters` rounds, [[run]]
  * THROWS (`IllegalStateException`) rather than returning labels that
  * look valid but are still under-merged — a silent wrong answer is
  * the one failure mode a dedup pipeline can't detect downstream.
  * Callers that want partial labels opt in explicitly via
  * [[runWithStatus]], which returns the labels plus a `converged`
  * flag. The default budget of 10 contraction rounds covers any
  * component a real corpus produces (propagation-style rounds needed
  * would be the diameter; contraction needs ~log₂ of it).
  */
object ConnectedComponents {

  def run(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 10): DataFrame = {
    val (labels, converged, iters) = runWithStatus(edges, srcCol, dstCol, maxIters)
    if (!converged) throw new IllegalStateException(
      s"ConnectedComponents did not converge in $iters contraction rounds; " +
        "rounds needed grow with log(component size), so this graph is " +
        "astronomically deep or maxIters was set very low; raise maxIters " +
        "or use runWithStatus to accept partial labels explicitly")
    labels
  }

  /** [[run]] without the convergence gate: returns (labels, converged,
    * roundsUsed). Labels are only exact when `converged` is true. */
  def runWithStatus(edges: DataFrame, srcCol: String, dstCol: String,
      maxIters: Int = 10): (DataFrame, Boolean, Int) = {
    require(maxIters > 0, "maxIters must be positive")
    // materialize the raw edge list once: the node inventory and the
    // canonical set below both read it, and `edges` is often an
    // expensive upstream (e.g. the n-gram pair join) that must not
    // evaluate once per consumer
    val raw = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .localCheckpoint()
    val nodes = raw.select(col("a").as("node"))
      .unionByName(raw.select(col("b").as("node")))
      .distinct()
    // canonical undirected form: (h, l) with h > l, self-loops dropped
    var cur = raw.filter(col("a") =!= col("b"))
      .select(greatest(col("a"), col("b")).as("h"),
        least(col("a"), col("b")).as("l"))
      .distinct()
      .localCheckpoint()
    var i = 0
    var converged = false
    while (i < maxIters && !converged) {
      // large-star over the symmetric view: m(u) = min({u} ∪ N(u)),
      // emit (v, m(u)) for every neighbor v > u — already canonical
      // since v > u ≥ m(u)
      val sym = cur.select(col("h").as("u"), col("l").as("v"))
        .unionByName(cur.select(col("l").as("u"), col("h").as("v")))
      val lmin = sym.groupBy("u").agg(min("v").as("mn"))
        .select(col("u"), least(col("u"), col("mn")).as("m"))
      // NOT checkpointed: both consumers (the min groupBy and the
      // rewire join) shuffle this subtree identically, so exchange
      // reuse computes it once inside afterSmall's one materialization
      // job — a second checkpoint here costs a whole extra job per
      // round, which is what regressed the r10 bench before this note
      val afterLarge = sym.join(lmin, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("h"), col("m").as("l"))
        .distinct()
      // small-star: canonical edges already group a node's ≤-neighbors
      // under it; rewire them (and the node itself) to their minimum —
      // (v, m) with v > m after the v ≠ m filter, canonical again
      val smin = afterLarge.groupBy("h").agg(min("l").as("m"))
      val afterSmall = afterLarge.join(smin, "h")
        .filter(col("l") =!= col("m"))
        .select(col("l").as("h"), col("m").as("l"))
        .unionByName(smin.select(col("h"), col("m").as("l")))
        .distinct()
        .localCheckpoint()
      cur = afterSmall
      i += 1
      // star-forest test on the distinct canonical set, ONE probe job:
      // a node violates iff it leads >1 edge (rows-per-h IS the
      // distinct-partner count on a set) or appears on both sides.
      // No violations ⇒ every node is either a degree-1 leaf (h) or a
      // center (l), centers below their leaves ⇒ min-rooted stars.
      converged = cur
        .select(col("h").as("node"), lit(1L).as("ih"), lit(0L).as("il"))
        .unionByName(cur
          .select(col("l").as("node"), lit(0L).as("ih"), lit(1L).as("il")))
        .groupBy("node").agg(sum("ih").as("nh"), sum("il").as("nl"))
        .filter(col("nh") > 1 || (col("nh") >= 1 && col("nl") >= 1))
        .isEmpty
    }
    // at fixpoint every edge is (non-min node → its component min):
    // h-nodes read their label off their single partner, l-nodes are
    // the minima labeling themselves. The same construction yields
    // best-known partial labels when not converged (min over observed
    // partners), which is what runWithStatus callers opted into.
    val starLabels = cur.groupBy(col("h").as("node")).agg(min("l").as("label"))
      .unionByName(cur.select(col("l").as("node"), col("l").as("label")).distinct())
      .groupBy("node").agg(min("label").as("label"))
    val labels = nodes.join(starLabels, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("label"), col("node")).as("label"))
    (labels, converged, i)
  }
}
