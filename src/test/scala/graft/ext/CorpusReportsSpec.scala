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

  // ------------- incremental corpus datacard (r17 VERDICT missing #5)

  private val longText = (1 to 60).map(i => s"the word$i and of").mkString(" ")
  private val cardB1 = Seq(
    (1L, "web", "en", longText),
    (2L, "web", "en", longText),            // exact dup of 1, same source
    (3L, "web", "de", "short junk ###"),
    (4L, "books", "en", longText + " trailer"))
  private val cardB2 = Seq(
    (10L, "web", "fr", longText),           // dup of 1's text, new lang
    (11L, "books", "en", longText + " trailer"), // cross-batch exact dup of 4
    (12L, "wiki", "en", "tiny"))

  private def cardDf(rows: Seq[(Long, String, String, String)]) =
    rows.toDF("doc_id", "source", "lang", "text")
  private def collectCard(df: org.apache.spark.sql.DataFrame) =
    df.select(col("source"), col("n_docs"), col("n_tokens"),
        col("mean_doc_tokens"), col("n_langs"), col("n_exact_dup"),
        col("dup_ratio"), col("n_keep"), col("keep_ratio"))
      .as[(String, Long, Long, Double, Long, Long, Double, Long, Double)]
      .collect().toSet

  test("datacard folds: report from state ≡ full corpusReport; replays fold nothing; cross-batch dups reduce") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_card").toString + "/card"
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB1), batchId = 0L,
      buckets = 4)
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB2), batchId = 1L,
      buckets = 4)
    val got = collectCard(CorpusReports.reportCorpusFromState(spark, root, 4))
    val want = collectCard(Profile.corpusReport(cardDf(cardB1 ++ cardB2)))
    assert(got == want, s"state datacard must equal the full scan:\n$got\n$want")
    // the cross-batch exact dup (11 vs 4) must have reduced n_uniq:
    // books has 2 docs but 1 distinct fingerprint
    val books = got.find(_._1 == "books").get
    assert(books._2 == 2L && books._6 == 1L,
      s"cross-batch dup must fold into the same fingerprint group: $books")
    // at-least-once replay: every state skips its stamp
    val counts = (
      CorpusReports.savedCorpusScalars(spark, root).count(),
      CorpusReports.savedCorpusLangs(spark, root).count(),
      CorpusReports.savedCorpusFp(spark, root, 4).count())
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB2), batchId = 1L,
      buckets = 4)
    assert((CorpusReports.savedCorpusScalars(spark, root).count(),
      CorpusReports.savedCorpusLangs(spark, root).count(),
      CorpusReports.savedCorpusFp(spark, root, 4).count()) == counts,
      "a replayed fold must append nothing to any of the three states")
    // provenance gating: AS OF batch 1 the report sees only batch 0
    assert(collectCard(CorpusReports.reportCorpusFromState(spark, root, 4,
        batchId = 1L)) ==
      collectCard(Profile.corpusReport(cardDf(cardB1))))
  }

  test("datacard erasure: report ≡ from-scratch over survivors; distinct reductions shrink; re-run appends nothing") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_card_erase").toString + "/card"
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB1 ++ cardB2),
      batchId = 0L, buckets = 4)
    // erase one copy of the web dup pair (1) AND wiki's only doc (12)
    val deleted = (cardB1 ++ cardB2).filter(r => r._1 == 1L || r._1 == 12L)
    CorpusReports.deleteDocsFromSavedCorpusReport(root, cardDf(deleted),
      eraseId = 0L, buckets = 4)
    val survivors = (cardB1 ++ cardB2).filterNot(r => r._1 == 1L || r._1 == 12L)
    val got = collectCard(CorpusReports.reportCorpusFromState(spark, root, 4))
    assert(got == collectCard(Profile.corpusReport(cardDf(survivors))),
      s"post-erase report must equal a from-scratch fold over survivors: $got")
    assert(!got.exists(_._1 == "wiki"), "a drained source drops entirely")
    // the surviving copy (2) keeps its fingerprint group alive: web
    // still counts the fp once, so n_exact_dup dropped by exactly one
    val web = got.find(_._1 == "web").get
    assert(web._6 == 1L, s"one dup pair left in web after the erase: $web")
    // re-delivered erasure appends nothing anywhere
    val counts = (
      CorpusReports.savedCorpusScalars(spark, root).count(),
      CorpusReports.savedCorpusLangs(spark, root).count(),
      CorpusReports.savedCorpusFp(spark, root, 4).count())
    CorpusReports.deleteDocsFromSavedCorpusReport(root, cardDf(deleted),
      eraseId = 0L, buckets = 4)
    assert((CorpusReports.savedCorpusScalars(spark, root).count(),
      CorpusReports.savedCorpusLangs(spark, root).count(),
      CorpusReports.savedCorpusFp(spark, root, 4).count()) == counts)
  }

  test("corpusDatacardStream wiring: MemoryStream batches fold; report from state ≡ full scan") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = java.nio.file.Files
      .createTempDirectory("graft_card_stream").toString + "/card"
    val input = MemoryStream[(Long, String, String, String)]
    val q = graft.streaming.CorpusStreams.corpusDatacardStream(
      input.toDF().toDF("doc_id", "source", "lang", "text"), root,
      buckets = 4).start()
    try {
      input.addData(cardB1: _*); q.processAllAvailable()
      input.addData(cardB2: _*); q.processAllAvailable()
    } finally q.stop()
    assert(collectCard(CorpusReports.reportCorpusFromState(spark, root, 4)) ==
      collectCard(Profile.corpusReport(cardDf(cardB1 ++ cardB2))))
  }

  test("datacard fp compaction: partials collapse to one net row per group, report unchanged, erase stamps fold in") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_card_compact").toString + "/card"
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB1), batchId = 0L,
      buckets = 4)
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB2), batchId = 1L,
      buckets = 4)
    CorpusReports.deleteDocsFromSavedCorpusReport(root,
      cardDf(cardB2.filter(_._1 == 12L)), eraseId = 0L, buckets = 4)
    val before = collectCard(CorpusReports.reportCorpusFromState(spark, root, 4))
    val rowsBefore = CorpusReports.savedCorpusFp(spark, root, 4).count()
    CorpusReports.compactSavedCorpusFp(spark, root, upToBatchId = 2L,
      buckets = 4)
    val after = CorpusReports.savedCorpusFp(spark, root, 4)
    // one net row per surviving (source, fp); the drained wiki group
    // (fold + erase cancel) dropped entirely
    assert(after.count() < rowsBefore,
      s"compaction must shrink partials ($rowsBefore -> ${after.count()})")
    assert(after.filter(col("source") === "wiki").isEmpty,
      "a cancelled (source, fp) group must drop at compaction")
    assert(after.filter(col("batch_id") =!= 1L).isEmpty,
      "every surviving partial carries the horizon stamp")
    assert(collectCard(CorpusReports.reportCorpusFromState(spark, root, 4)) ==
      before, "the report must be identical after compaction")
    // a later fold still appends through the re-pinned bucket marker
    CorpusReports.updateSavedCorpusReport(root,
      cardDf(Seq((30L, "web", "en", "brand new content here"))),
      batchId = 5L, buckets = 4)
    assert(CorpusReports.savedCorpusFp(spark, root, 4)
      .filter(col("batch_id") === 5L).count() == 1L)
  }

  test("as-of probes at or below the fp compaction horizon are REJECTED, above it exact; the horizon is monotone (r18 ADVICE)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_card_horizon").toString + "/card"
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB1), batchId = 0L,
      buckets = 4)
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB2), batchId = 1L,
      buckets = 4)
    assert(CorpusReports.savedFpCompactionHorizon(spark, root, 4).isEmpty,
      "no horizon before any compaction")
    // as-of probes work at every stamp BEFORE compaction
    val asOf1 = collectCard(
      CorpusReports.reportCorpusFromState(spark, root, 4, batchId = 1L))
    val asOf2 = collectCard(
      CorpusReports.reportCorpusFromState(spark, root, 4, batchId = 2L))
    assert(asOf1 == collectCard(Profile.corpusReport(cardDf(cardB1))))
    CorpusReports.compactSavedCorpusFp(spark, root, upToBatchId = 2L,
      buckets = 4)
    assert(CorpusReports.savedFpCompactionHorizon(spark, root, 4)
      .contains(1L))
    // at/below the horizon: the fp partials were collapsed to stamp 1
    // while the scalars keep stamp 0 — a probe at batchId=1 would see
    // scalars without fp rows and silently DROP sources via the inner
    // join; it must throw naming the horizon instead
    val e = intercept[IllegalArgumentException] {
      CorpusReports.reportCorpusFromState(spark, root, 4, batchId = 1L)
    }
    assert(e.getMessage.contains("horizon"), e.getMessage)
    // strictly above the horizon: exact, unchanged by compaction; the
    // full report takes no horizon check at all
    assert(collectCard(CorpusReports.reportCorpusFromState(spark, root, 4,
      batchId = 2L)) == asOf2)
    assert(collectCard(CorpusReports.reportCorpusFromState(spark, root, 4)) ==
      collectCard(Profile.corpusReport(cardDf(cardB1 ++ cardB2))))
    // monotone: a re-compaction with a LOWER upToBatchId must not
    // lower the published horizon — rows collapsed to stamp 1 are
    // still there, so re-admitting batchId=1 probes would silently
    // drop sources again
    CorpusReports.compactSavedCorpusFp(spark, root, upToBatchId = 1L,
      buckets = 4)
    assert(CorpusReports.savedFpCompactionHorizon(spark, root, 4)
      .contains(1L), "the horizon must never move backwards")
    intercept[IllegalArgumentException] {
      CorpusReports.reportCorpusFromState(spark, root, 4, batchId = 1L)
    }
  }

  test("fp horizon swaps in atomically: a crash inside the compaction swap keeps the OLD state AND the OLD horizon pin (r19 ADVICE)") {
    val root = java.nio.file.Files
      .createTempDirectory("graft_card_crash").toString + "/card"
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB1), batchId = 0L,
      buckets = 4)
    CorpusReports.updateSavedCorpusReport(root, cardDf(cardB2), batchId = 1L,
      buckets = 4)
    CorpusReports.compactSavedCorpusFp(spark, root, upToBatchId = 2L,
      buckets = 4)
    assert(CorpusReports.savedFpCompactionHorizon(spark, root, 4)
      .contains(1L))
    val before = collectCard(
      CorpusReports.reportCorpusFromState(spark, root, 4))
    // a second compaction whose swap body dies AFTER the rows and
    // marker were staged but BEFORE the rename pair: the pre-r20
    // shape published the marker after the swap, so a crash there
    // could destroy the old pin with the old dir and leave NO marker
    // at all — silently re-admitting probes below the previously-
    // protected horizon. With the marker staged IN the sibling, the
    // old root (rows + pin) must survive untouched.
    intercept[RuntimeException] {
      SuffixDedup.compactBucketedState(spark, root + "/fp",
        "graft_cfp_idx_",
        "g STRING, source STRING, doc_count BIGINT, batch_id BIGINT", 4,
        CorpusReports.savedCorpusFp(spark, root, 4),
        inSwap = _ => throw new RuntimeException("crash mid-swap"))
    }
    assert(CorpusReports.savedFpCompactionHorizon(spark, root, 4)
      .contains(1L),
      "the old horizon pin must survive a crashed compaction swap")
    assert(collectCard(CorpusReports.reportCorpusFromState(spark, root, 4))
      == before, "the old state must survive a crashed compaction swap")
    // and the reject guard is still armed at the old horizon
    intercept[IllegalArgumentException] {
      CorpusReports.reportCorpusFromState(spark, root, 4, batchId = 1L)
    }
  }
}
