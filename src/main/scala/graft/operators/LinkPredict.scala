package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Neighborhood link prediction (Liben-Nowell & Kleinberg 2003): score
  * NON-adjacent node pairs by common-neighbor count and neighborhood
  * Jaccard — the candidate-edge primitive a curation pipeline runs
  * over its knn / crawl graphs to find near-dup pairs the banded LSH
  * missed (two docs sharing most of their neighbors are near-dups by
  * transitivity even when no band collided) and to densify sparse
  * similarity graphs before community detection.
  *
  * Everything is exact integers + the 4-dp integer-scaled Jaccard
  * (the [[graft.ext.Dedup.ngramJaccardPairs]] discipline), so the
  * per-node top-k under (jaccard DESC, cn DESC, id ASC) is
  * engine-independent.
  *
  * Scale shape: candidate pairs come from the WEDGE join (two hops
  * through a shared middle node, a < b so each unordered pair once) —
  * Σ deg² rows, the [[TriangleCount]] cost model (oriented-degree
  * bounded on knn graphs; a hub-heavy general graph wants the same
  * degree-orientation guard). Existing edges leave by an equality
  * anti-join on the canonical edge set; the scoring join touches only
  * surviving candidates; the top-k window partitions per node.
  */
object LinkPredict {

  /** @param edges edge list, treated as UNDIRECTED (symmetrized,
    *              deduped, self-loops dropped internally)
    * @return top-`k` predicted links per source node (each unordered
    *         pair appears once, at its smaller endpoint):
    *         (node_a, node_b, common_neighbors, jaccard, rank) */
  def topK(edges: DataFrame, srcCol: String, dstCol: String,
      k: Int = 5): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint()
    val canon = und.filter(col("a") < col("b"))
    val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
    // wedges through a shared middle: (x,m) + (m,y), x < y — each
    // candidate pair counted once per common neighbor
    val cn = und.select(col("b").as("m"), col("a").as("x"))
      .join(und.select(col("a").as("m"), col("b").as("y")), "m")
      .filter(col("x") < col("y"))
      .groupBy(col("x").as("a"), col("y").as("b"))
      .agg(count(lit(1)).as("common_neighbors"))
    val candidates = cn.join(canon, Seq("a", "b"), "left_anti")
    candidates
      .join(deg.select(col("a"), col("d").as("da")), "a")
      .join(deg.select(col("a").as("b"), col("d").as("db")), "b")
      // integer-scaled rounding — see Dedup.ngramJaccardPairs
      .withColumn("jaccard",
        round(col("common_neighbors") * lit(10000.0) /
          (col("da") + col("db") - col("common_neighbors"))) / 1e4)
      .withColumn("rank", row_number().over(
        Window.partitionBy("a").orderBy(col("jaccard").desc,
          col("common_neighbors").desc, col("b").asc)))
      .filter(col("rank") <= k)
      .select(col("a").as("node_a"), col("b").as("node_b"),
        col("common_neighbors"), col("jaccard"), col("rank"))
  }
}
