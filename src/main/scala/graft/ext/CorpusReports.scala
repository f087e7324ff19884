package graft.ext

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental corpus-level reports from SAVED counted state (r16
  * VERDICT "what's missing" #4): the batch-fold discipline the dedup
  * screens and the df-index novelty use, applied to the report
  * rollups a continuously-ingesting pipeline re-reads every day —
  * starting with the PII-density compliance triage. The state is
  * signed per-key partials (key, counts..., batch_id): folds append
  * positive rows stamped with their batch id (the replay marker —
  * counted folds are not idempotent), erasures append NEGATIVE rows
  * under a unique negative stamp (−1 − eraseId), and the report is
  * one aggregate over the state — never a corpus rescan.
  *
  * Scale shape: per-SOURCE state is O(sources × (batches + erasures))
  * rows of five longs — kilobytes at any corpus size, so unlike the
  * gram/df indexes it needs no bucketing; the fold is the only pass
  * that touches the batch, and it is one map-side-combinable
  * aggregate.
  */
object CorpusReports {

  /** One batch's per-source PII contributions: (source, n_docs,
    * n_tokens, n_pii) — the counted-fold unit of
    * [[reportPiiDensityFromState]]. Same staged counter as the
    * `report_pii_density` catalog query ([[TextOps.piiCount]]). */
  def piiContribs(df: DataFrame, sourceCol: String = "source",
      textCol: String = "text"): DataFrame =
    df.select(col(sourceCol).as("source"),
        size(TextOps.tokens(col(textCol))).cast("long").as("__nt"),
        TextOps.piiCount(col(textCol)).cast("long").as("__pii"))
      .groupBy("source")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        sum(col("__pii")).as("n_pii"))

  /** The saved per-source PII state at `root` — empty-schema frame
    * when the root holds no data yet (the shared
    * [[SketchState.readStateOrEmpty]] reader, swap-heal included). */
  def savedPiiCounts(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame = {
    import org.apache.spark.sql.types._
    SketchState.readStateOrEmpty(spark, root,
      StructType(Seq(
        StructField("source", StringType),
        StructField("n_docs", LongType),
        StructField("n_tokens", LongType),
        StructField("n_pii", LongType),
        StructField("batch_id", LongType))))
  }

  /** Fold one micro-batch's contributions into the saved state; a
    * batch id already present appends nothing (at-least-once replay
    * marker). `batchId` must be ≥ 0 — negative ids are the erasure
    * stamp space. */
  def updateSavedPiiCounts(root: String, batch: DataFrame, batchId: Long,
      sourceCol: String = "source", textCol: String = "text"): Unit = {
    require(batchId >= 0, "fold batch ids must be >= 0")
    val spark = batch.sparkSession
    if (!savedPiiCounts(spark, root)
        .filter(col("batch_id") === batchId).isEmpty) return
    piiContribs(batch, sourceCol, textCol)
      .withColumn("batch_id", lit(batchId))
      .write.mode("append").parquet(root)
  }

  /** Right-to-erasure for the PII state: the deleted docs' per-source
    * contributions DECREMENT the counts exactly (negative partials
    * under stamp −1 − `eraseId`; a re-delivered erasure with the same
    * id appends nothing) — after the erase the report equals a
    * from-scratch fold over the survivors. Precondition, as for every
    * erasure path: the deleted docs were actually folded, exactly
    * once. */
  def deleteDocsFromSavedPiiCounts(root: String, deleted: DataFrame,
      eraseId: Long, sourceCol: String = "source",
      textCol: String = "text"): Unit = {
    require(eraseId >= 0, "eraseId must be >= 0")
    val stamp = -1L - eraseId
    val spark = deleted.sparkSession
    if (!savedPiiCounts(spark, root)
        .filter(col("batch_id") === stamp).isEmpty) return
    piiContribs(deleted, sourceCol, textCol)
      .select(col("source"), (-col("n_docs")).as("n_docs"),
        (-col("n_tokens")).as("n_tokens"), (-col("n_pii")).as("n_pii"),
        lit(stamp).as("batch_id"))
      .write.mode("append").parquet(root)
  }

  /** The PII-density report from state alone: per-source totals over
    * partials with `batch_id < batchId` (erasure stamps are negative,
    * so every probe sees them) — ≡ the full-corpus
    * `report_pii_density` over everything folded minus everything
    * erased (spec-pinned, and the equality the incremental catalog
    * query hash-checks). Sources whose rows cancel to zero docs drop
    * from the report, exactly as a from-scratch fold would never see
    * them. */
  def reportPiiDensityFromState(state: DataFrame,
      batchId: Long = Long.MaxValue): DataFrame =
    state.filter(col("batch_id") < batchId)
      .groupBy("source")
      .agg(sum(col("n_docs")).as("n_docs"),
        sum(col("n_tokens")).as("n_tokens"),
        sum(col("n_pii")).as("n_pii"))
      .filter(col("n_docs") > 0)
      .withColumn("pii_share",
        when(col("n_tokens") > 0,
          round(col("n_pii") * 10000.0 / col("n_tokens")) / 1e4)
          .otherwise(lit(0.0)))
}
