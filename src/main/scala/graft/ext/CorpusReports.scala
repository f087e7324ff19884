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

  // ------------------------------- incremental corpus datacard state

  /** Table name for the bucketed per-(source, fingerprint) counted
    * state under `root/fp` (the datacard's one corpus-sized state). */
  def corpusFpTableName(root: String): String =
    SuffixDedup.indexTableName("graft_cfp_idx_", root + "/fp")

  /** Composite-key separator for the fp state's clustering key
    * g = source + sep + fingerprint: U+0001 can appear in neither a
    * source name nor an md5 hex fingerprint, so the key never
    * aliases across (source, fp) pairs. */
  private val FpSep = "\u0001"

  private def scalarsSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("source", StringType),
      StructField("n_docs", LongType),
      StructField("n_tokens", LongType),
      StructField("n_keep", LongType),
      StructField("batch_id", LongType)))
  }

  private def langsSchema = {
    import org.apache.spark.sql.types._
    StructType(Seq(
      StructField("source", StringType),
      StructField("lang", StringType),
      StructField("n_docs", LongType),
      StructField("batch_id", LongType)))
  }

  /** The saved per-source scalar partials (docs/tokens/keep). */
  def savedCorpusScalars(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    SketchState.readStateOrEmpty(spark, root + "/scalars", scalarsSchema)

  /** The saved per-(source, lang) counted partials. */
  def savedCorpusLangs(spark: org.apache.spark.sql.SparkSession,
      root: String): DataFrame =
    SketchState.readStateOrEmpty(spark, root + "/langs", langsSchema)

  /** The saved per-(source, fingerprint) counted partials as a
    * g-CLUSTERED bucketed table — the datacard's only corpus-sized
    * state (one row per distinct (source, fp) per contributing batch),
    * so it gets the gram-index discipline: folds append through the
    * catalog, the per-g collapse in [[reportCorpusFromState]] groups
    * on the clustering key and runs exchange-free, and the state never
    * reshuffles per batch. */
  def savedCorpusFp(spark: org.apache.spark.sql.SparkSession,
      root: String, buckets: Int = 16): DataFrame =
    SuffixDedup.ensureBucketedTable(spark, root + "/fp",
      corpusFpTableName(root),
      "g STRING, source STRING, doc_count BIGINT, batch_id BIGINT", buckets)

  /** One batch's datacard contributions, appended to the three states
    * as SIGNED counted partials under `sign` and `stamp` — the shared
    * body of the fold and the erasure (identical arithmetic on both
    * sides is what makes the erase exact). Each state skips
    * independently if it already carries the stamp, so a crash between
    * the three appends converges on re-delivery without double-
    * counting any of them. */
  private def appendCorpusContribs(root: String, df: DataFrame,
      stamp: Long, sign: Long, idCol: String, textCol: String,
      srcCol: String, langCol: String, buckets: Int): Unit = {
    val spark = df.sparkSession
    val perDoc = Profile.corpusDocSignals(df, idCol, textCol, srcCol,
      langCol).localCheckpoint() // three aggregate consumers, one scan
    if (savedCorpusScalars(spark, root)
        .filter(col("batch_id") === stamp).isEmpty)
      perDoc.groupBy("source")
        .agg((count(lit(1)) * sign).as("n_docs"),
          (sum("n_words") * sign).as("n_tokens"),
          (sum(when(col("keep"), 1L).otherwise(0L)) * sign).as("n_keep"))
        .withColumn("batch_id", lit(stamp))
        .write.mode("append").parquet(root + "/scalars")
    if (savedCorpusLangs(spark, root)
        .filter(col("batch_id") === stamp).isEmpty)
      perDoc.groupBy("source", "lang")
        .agg((count(lit(1)) * sign).as("n_docs"))
        .withColumn("batch_id", lit(stamp))
        .write.mode("append").parquet(root + "/langs")
    val fpTbl = savedCorpusFp(spark, root, buckets)
    if (fpTbl.filter(col("batch_id") === stamp).isEmpty)
      perDoc.groupBy("source", "fp")
        .agg((count(lit(1)) * sign).as("doc_count"))
        .select(concat(col("source"), lit(FpSep), col("fp")).as("g"),
          col("source"), col("doc_count"), lit(stamp).as("batch_id"))
        .write.mode("append").insertInto(corpusFpTableName(root))
  }

  /** Fold one micro-batch into the saved datacard state (the
    * incremental form of [[Profile.corpusReport]] — r17 VERDICT
    * "What's missing" #5): per-source scalars and per-(source, lang)
    * counts are kilobyte states; the per-(source, fingerprint) counts
    * are the corpus-sized one and land bucketed. At-least-once
    * replay-safe per state via the batch-id stamp. */
  def updateSavedCorpusReport(root: String, batch: DataFrame,
      batchId: Long, idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source", langCol: String = "lang",
      buckets: Int = 16): Unit = {
    require(batchId >= 0, "fold batch ids must be >= 0")
    appendCorpusContribs(root, batch, batchId, 1L, idCol, textCol,
      srcCol, langCol, buckets)
  }

  /** Right-to-erasure for the datacard state: the deleted docs'
    * contributions DECREMENT all three states exactly (negative
    * partials under stamp −1 − `eraseId`; a re-delivered erasure with
    * the same id appends nothing to any state it already reached) —
    * after the erase the report equals a from-scratch fold over the
    * survivors, including the distinct-fingerprint and distinct-lang
    * reductions (a (source, fp) or (source, lang) group whose counts
    * cancel to ≤ 0 drops from the reduction exactly as if never
    * folded). Precondition, as for every counted erase: the deleted
    * docs were actually folded, exactly once. */
  def deleteDocsFromSavedCorpusReport(root: String, deleted: DataFrame,
      eraseId: Long, idCol: String = "doc_id", textCol: String = "text",
      srcCol: String = "source", langCol: String = "lang",
      buckets: Int = 16): Unit = {
    require(eraseId >= 0, "eraseId must be >= 0")
    appendCorpusContribs(root, deleted, -1L - eraseId, -1L, idCol,
      textCol, srcCol, langCol, buckets)
  }

  /** COMPACTION for the datacard's fp state — the
    * [[Dedup.compactSavedDfIndex]] discipline applied to the one
    * corpus-sized datacard state: every partial with `batch_id <
    * upToBatchId` (folds below the horizon AND all erasure stamps,
    * which are negative) collapses to one net row per (source, fp),
    * stamped `upToBatchId − 1`; zero-net groups drop. Bounds the
    * state back to O(distinct (source, fp)) — the signed-partials
    * discipline otherwise grows one row per contributing batch per
    * group. Same quiesced-maintenance PRECONDITIONS as the df index:
    * no concurrent readers, and nothing below the horizon (fold or
    * acknowledged erasure) will ever re-deliver — its marker rows
    * collapse, so a later replay would double-count. The scalar and
    * lang states stay uncompacted by design: they are
    * O(sources × batches) rows of a few longs — kilobytes at any
    * corpus size. Swap discipline and crash healing are
    * [[SuffixDedup.compactBucketedState]]'s. */
  def compactSavedCorpusFp(spark: org.apache.spark.sql.SparkSession,
      root: String, upToBatchId: Long, buckets: Int = 16): Unit = {
    require(upToBatchId >= 1,
      "upToBatchId must be >= 1 (the compacted stamp is upToBatchId - 1)")
    // the horizon is MONOTONE: a re-compaction with a lower
    // upToBatchId leaves earlier-collapsed rows (stamped at the old,
    // higher horizon) in place, so lowering the published horizon
    // would re-admit probes that still hit them — read the prior pin
    // before the swap destroys it and publish the max
    val priorHorizon = savedFpCompactionHorizon(spark, root, buckets)
    val idx = savedCorpusFp(spark, root, buckets)
    val compacted = idx.filter(col("batch_id") < upToBatchId)
      .groupBy("g", "source").agg(sum("doc_count").as("doc_count"))
      .filter(col("doc_count") =!= 0)
      .withColumn("batch_id", lit(upToBatchId - 1))
      .unionByName(idx.filter(col("batch_id") >= upToBatchId)
        .select("g", "source", "doc_count", "batch_id"))
      .select("g", "source", "doc_count", "batch_id")
    // The horizon marker writes INTO the staged sibling (the in-swap
    // hook), so it swaps in atomically with the re-stamped rows — the
    // [[Dedup.compactSavedDfIndex]] carryMarker discipline. Publishing
    // it AFTER the swap (the pre-r20 shape) had a crash window where
    // the swap had already destroyed the prior pin with the old dir
    // and the new marker never landed: as-of probes below the
    // PREVIOUSLY-protected horizon would be silently re-admitted —
    // they see compacted fp rows stamped at the horizon but scalars at
    // original stamps, and the report's inner join silently DROPS
    // those sources (r19 ADVICE #1). [[reportCorpusFromState]] reads
    // this marker and rejects such probes loudly.
    val fs = new org.apache.hadoop.fs.Path(root + "/fp")
      .getFileSystem(spark.sessionState.newHadoopConf())
    val horizon =
      math.max(upToBatchId - 1, priorHorizon.getOrElse(Long.MinValue))
    SuffixDedup.compactBucketedState(spark, root + "/fp",
      "graft_cfp_idx_",
      "g STRING, source STRING, doc_count BIGINT, batch_id BIGINT",
      buckets, compacted,
      inSwap = tmpDir => SuffixDedup.writeMarkerAtomic(fs,
        new org.apache.hadoop.fs.Path(tmpDir), FpHorizonMarker,
        horizon.toString))
  }

  /** Marker recording the fp state's compaction horizon (the stamp
    * every partial below `upToBatchId` was collapsed TO). */
  private val FpHorizonMarker = "_graft_cfp_horizon"

  /** The fp state's compaction horizon, if any compaction has run:
    * as-of probes must stay strictly ABOVE it (see
    * [[compactSavedCorpusFp]]). */
  def savedFpCompactionHorizon(spark: org.apache.spark.sql.SparkSession,
      root: String, buckets: Int = 16): Option[Long] = {
    savedCorpusFp(spark, root, buckets) // heal a crashed swap first
    val marker = new org.apache.hadoop.fs.Path(root + "/fp", FpHorizonMarker)
    val fs = marker.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(marker)) None
    else {
      val in = fs.open(marker)
      val txt = try scala.io.Source.fromInputStream(in, "UTF-8")
        .mkString.trim finally in.close()
      if (txt.isEmpty) None else Some(txt.toLong)
    }
  }

  /** The per-source datacard from state alone — ≡
    * [[Profile.corpusReport]] over everything folded minus everything
    * erased (the shared-projection guarantee: this joins the same
    * three aggregates and hands them to the same finalize step).
    * The fp collapse groups on the bucketed table's clustering key
    * (plus its functionally-dependent source), so the corpus-sized
    * state aggregates in place; what shuffles afterwards is one row
    * per distinct (source, fp) — map-side-combined down to
    * sources × partitions rows before it moves. */
  def reportCorpusFromState(spark: org.apache.spark.sql.SparkSession,
      root: String, buckets: Int = 16,
      batchId: Long = Long.MaxValue): DataFrame = {
    // as-of probes below the fp state's compaction horizon are
    // UNSUPPORTED, and must fail loudly rather than silently drop
    // sources (r18 ADVICE #3): partials at or below the horizon were
    // collapsed to one row stamped AT the horizon, so a probe there
    // would filter out every fp row while the uncompacted scalars
    // survive, and the inner join would eat those sources whole
    if (batchId != Long.MaxValue)
      savedFpCompactionHorizon(spark, root, buckets).foreach { h =>
        require(batchId > h,
          s"as-of probe batchId=$batchId is at or below the fp state's " +
            s"compaction horizon $h — partials there were collapsed to " +
            s"stamp $h and the report would silently drop sources; probe " +
            s"with batchId > $h, or don't compact past stamps still probed")
      }
    val base = savedCorpusScalars(spark, root)
      .filter(col("batch_id") < batchId)
      .groupBy("source")
      .agg(sum("n_docs").as("n_docs"), sum("n_tokens").as("n_tokens"),
        sum("n_keep").as("n_keep"))
      .filter(col("n_docs") > 0)
    val uniq = savedCorpusFp(spark, root, buckets)
      .filter(col("batch_id") < batchId)
      .groupBy("g", "source").agg(sum("doc_count").as("__c"))
      .filter(col("__c") > 0)
      .groupBy("source").agg(count(lit(1)).as("__n_uniq"))
    val langs = savedCorpusLangs(spark, root)
      .filter(col("batch_id") < batchId)
      .groupBy("source", "lang").agg(sum("n_docs").as("__c"))
      .filter(col("__c") > 0)
      .groupBy("source").agg(count(lit(1)).as("n_langs"))
    Profile.finalizeCorpusReport(
      base.join(uniq, "source").join(langs, "source"))
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
