package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** The saved counted report state (r16 VERDICT missing #4): per-batch
  * PII-density folds, at-least-once replay markers, exact erasure
  * decrements, and the streaming wiring.
  */
class CorpusReportsSpec extends SparkSpec {
  import spark.implicits._

  private val batch1 = Seq(
    (1L, "web", "contact me at alice@example.com for details"),
    (2L, "web", "clean text with no identifiers at all"),
    (3L, "books", "server at 10.1.2.3 answered then 1234567 came up"))
  private val batch2 = Seq(
    (10L, "web", "bob@example.org wrote back with 99999999 attached"),
    (11L, "wiki", "nothing sensitive in this one"))

  private def full(rows: Seq[(Long, String, String)]) =
    CorpusReports.piiContribs(rows.toDF("doc_id", "source", "text"))
      .withColumn("pii_share",
        when(col("n_tokens") > 0,
          round(col("n_pii") * 10000.0 / col("n_tokens")) / 1e4)
          .otherwise(lit(0.0)))
  private def collect(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source"), col("n_docs"), col("n_tokens"),
        col("n_pii"), col("pii_share"))
      .as[(String, Long, Long, Long, Double)].collect().toSet

  test("counted folds: report from state ≡ full recompute; a replayed batch folds nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pii_counts").toString + "/pii"
    CorpusReports.updateSavedPiiCounts(root,
      batch1.toDF("doc_id", "source", "text"), batchId = 0L)
    CorpusReports.updateSavedPiiCounts(root,
      batch2.toDF("doc_id", "source", "text"), batchId = 1L)
    val got = collect(CorpusReports.reportPiiDensityFromState(
      CorpusReports.savedPiiCounts(spark, root)))
    assert(got == collect(full(batch1 ++ batch2)), s"state report: $got")
    // provenance gating: a probe AS OF batch 1 sees only batch 0
    assert(collect(CorpusReports.reportPiiDensityFromState(
        CorpusReports.savedPiiCounts(spark, root), batchId = 1L)) ==
      collect(full(batch1)))
    // at-least-once replay: the batch-id stamp skips the re-fold
    val rows = CorpusReports.savedPiiCounts(spark, root).count()
    CorpusReports.updateSavedPiiCounts(root,
      batch2.toDF("doc_id", "source", "text"), batchId = 1L)
    assert(CorpusReports.savedPiiCounts(spark, root).count() == rows)
    assert(collect(CorpusReports.reportPiiDensityFromState(
      CorpusReports.savedPiiCounts(spark, root))) ==
      collect(full(batch1 ++ batch2)))
  }

  test("erasure decrements exactly: report ≡ from-scratch over survivors; a drained source drops; same eraseId re-run appends nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_pii_erase").toString + "/pii"
    CorpusReports.updateSavedPiiCounts(root,
      batch1.toDF("doc_id", "source", "text"), batchId = 0L)
    CorpusReports.updateSavedPiiCounts(root,
      batch2.toDF("doc_id", "source", "text"), batchId = 1L)
    // erase doc 3 — the ONLY books doc: the source must vanish from
    // the report, exactly as a from-scratch fold over survivors
    val deleted = (batch1 ++ batch2).filter(_._1 == 3L)
    val survivors = (batch1 ++ batch2).filter(_._1 != 3L)
    CorpusReports.deleteDocsFromSavedPiiCounts(root,
      deleted.toDF("doc_id", "source", "text"), eraseId = 0L)
    val got = collect(CorpusReports.reportPiiDensityFromState(
      CorpusReports.savedPiiCounts(spark, root)))
    assert(got == collect(full(survivors)), s"post-erase report: $got")
    assert(!got.exists(_._1 == "books"), "a drained source must drop")
    // idempotent under the same stamp
    val rows = CorpusReports.savedPiiCounts(spark, root).count()
    CorpusReports.deleteDocsFromSavedPiiCounts(root,
      deleted.toDF("doc_id", "source", "text"), eraseId = 0L)
    assert(CorpusReports.savedPiiCounts(spark, root).count() == rows)
  }

  test("piiDensityStream wiring: MemoryStream batches fold into the saved state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("graft_pii_stream").toString + "/pii"
    val input = MemoryStream[(Long, String, String)]
    val q = graft.streaming.CorpusStreams.piiDensityStream(
      input.toDF().toDF("doc_id", "source", "text"), root).start()
    try {
      input.addData(batch1: _*); q.processAllAvailable()
      input.addData(batch2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(collect(CorpusReports.reportPiiDensityFromState(
      CorpusReports.savedPiiCounts(spark, root))) ==
      collect(full(batch1 ++ batch2)))
  }
}
