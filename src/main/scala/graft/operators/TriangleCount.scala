package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact per-node triangle counting — the local-clustering primitive a
  * curation pipeline reads off its knn / link graphs (a node whose
  * neighbors interlink is inside a dense near-dup or topical cluster;
  * a triangle-free node's neighbors are incidental). Complements
  * [[LabelPropagation]] (communities) and [[PageRank]] (centrality)
  * with the third classic graph statistic.
  *
  * Algorithm: DEGREE ORIENTATION (the MapReduce-era standard — Suri &
  * Vassilvitskii 2011, "Counting Triangles and the Curse of the Last
  * Reducer"): orient every undirected edge from the (degree, id)-
  * smaller endpoint to the larger, enumerate wedges only at each
  * node's ORIENTED out-neighbors, and close them against the
  * id-canonical edge set. Each triangle has exactly one node that
  * out-points to the other two under the total order, so it is
  * counted exactly once — and oriented out-degrees are O(√m), so the
  * wedge join is Σ outdeg² ≤ O(m^{3/2}) instead of the Σ deg² blowup
  * a hub node causes in the naive join ("the curse of the last
  * reducer" is precisely the 100 TB failure mode). Everything is
  * equality joins + exact integer counts: deterministic under any
  * partitioning and replayable in portable SQL.
  */
object TriangleCount {

  /** @param edges directed or undirected edge list (symmetrized,
    *              deduped, self-loops dropped internally)
    * @return one row per node appearing in `edges`:
    *         (node, n_triangles) — triangles through that node. */
  def perNode(edges: DataFrame, srcCol: String, dstCol: String): DataFrame = {
    val e = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
    // both directions, deduped — degree = undirected neighbor count
    val und = e.union(e.select(col("b").as("a"), col("a").as("b")))
      .filter(col("a") =!= col("b"))
      .distinct().localCheckpoint()
    val canon = und.filter(col("a") < col("b"))
    val deg = und.groupBy("a").agg(count(lit(1)).as("d"))
    // orient each canonical edge low→high under the (degree, id)
    // total order; materialized once for the wedge self-join AND the
    // closing semi-join's source
    val oriented = canon
      .join(deg.select(col("a"), col("d").as("da")), "a")
      .join(deg.select(col("a").as("b"), col("d").as("db")), "b")
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("u"), col("b").as("v")))
          .otherwise(struct(col("b").as("u"), col("a").as("v"))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint()
    // wedges at each source's out-neighbors (ordered by id so each
    // unordered pair appears once), closed against the id-canonical
    // edge set — the closing pair's own orientation is irrelevant
    val wedges = oriented.as("x").join(oriented.as("y"),
        col("x.u") === col("y.u") && col("x.v") < col("y.v"))
      .select(col("x.u").as("u"), col("x.v").as("p"), col("y.v").as("q"))
    val triangles = wedges.join(canon,
        wedges("p") === canon("a") && wedges("q") === canon("b"), "left_semi")
    val perNodeCounts = triangles
      .select(explode(array(col("u"), col("p"), col("q"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n"))
    und.select(col("a").as("node")).distinct()
      .join(perNodeCounts, Seq("node"), "left_outer")
      .select(col("node"), coalesce(col("n"), lit(0L)).as("n_triangles"))
  }
}
