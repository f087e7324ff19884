package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding-corpus QA: the profiling pass over a vector column that
  * catches bad batches before they poison ANN/dedup — zero-norm rows,
  * exploded components, drifted label centroids.
  *
  * Determinism discipline: component means use the micro-scaled BIGINT
  * sum (order-independent, oracle-exact); norms go through the same
  * codegen'd float dot product as the similarity operators, which both
  * engines reproduce bit-for-bit before the 4-dp rounding.
  */
object VectorStats {

  /** Per-vector scalars: dimension, L2 norm (4 dp), max |component|
    * (exact — no arithmetic beyond widening), micro-exact component
    * mean. Pure per-row (one HOF fold per vector), no shuffle. */
  def vectorStats(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    import graft.functions.VectorMath.dotF
    val v = col(vecCol)
    df.select(
      col(idCol),
      size(v).as("dim"),
      (round(sqrt(dotF(v, v)) * lit(10000.0)) / 1e4).as("l2_norm"),
      array_max(transform(v, x => abs(x.cast("double")))).as("max_abs"),
      (aggregate(v, lit(0L),
          (acc, x) => acc + round(x.cast("double") * 1e6).cast("long"))
        .cast("double") / size(v) / 1e6).as("mean_c"))
  }

  /** Exact per-label component centroids as SCALAR rows
    * (label, pos, centroid) — posexplode + one map-side-combined
    * shuffle of |labels|·dim groups; the array form is a downstream
    * `collect_list` away when needed (e.g. IVF seeding). Micro-scaled
    * integer sums make the mean bit-identical across engines and
    * partitionings. */
  def componentCentroids(df: DataFrame, labelCol: String,
      vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .groupBy("label", "pos")
      .agg((sum(round(col("col").cast("double") * 1e6).cast("long"))
        .cast("double") / count(lit(1)) / 1e6).as("centroid"))
}
