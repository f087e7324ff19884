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
}
