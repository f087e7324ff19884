package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Opt-in suffix-ladder scale smoke (set GRAFT_SCALE_SMOKE=1; r14
  * VERDICT #7): the prefix-doubling pipeline is the newest
  * scale-sensitive path and the 100k-doc corpus is ~6.5M suffix
  * positions — the regime where a quadratic pair blowup or a
  * ladder that loses its log-depth bound shows up as minutes, not
  * milliseconds. Asserts three contracts at once:
  *   - LADDER DEPTH: with planted repeats deep enough to hold ties to
  *     the doc-length horizon, the level count is EXACTLY
  *     1 + ⌈log2(maxDocLen/BaseLen)⌉ (base + one table per doubling
  *     round) — more means the fixpoint stop regressed, fewer means
  *     rounds were skipped and LCPs would silently truncate;
  *   - EXACTNESS AT SCALE: the planted 300-token cross-offset repeats
  *     come back as exactly their merged spans, ALL occurrences;
  *   - WALL CLOCK: generous cap — the guarded failure mode is
  *     minutes-vs-seconds (a pair join or a lost shuffle reuse), not
  *     percent.
  */
class SuffixScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.contains("GRAFT_SCALE_SMOKE")
  private def smokeTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  smokeTest("suffix ladder: log-depth rounds + exact planted spans at 100k docs / 6.5M tokens") {
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val corpus = (0 until 200).map { rep =>
      base.withColumn("doc_id", col("doc_id") + lit(rep * 1000000L))
        .withColumn("text",
          concat(col("text"), lit(s" unique tail $rep variant "),
            (col("doc_id") % 97).cast("string")))
    }.reduce(_.unionByName(_))
    // two deep planted repeats: one 300-token passage at offset 0 and
    // offset 3 — ties that survive every doubling round until the
    // horizon, so the ladder must run its full depth
    val passage = (1 to 300).map(i => s"deep$i").mkString(" ")
    val planted = Seq(
      (900000001L, s"$passage trailer one"),
      (900000002L, s"lead tokens here $passage"))
      .toDF("doc_id", "text")
    val all = corpus.unionByName(planted).repartition(8).cache()
    val nDocs = all.count()
    assert(nDocs > 100000L, s"corpus must be 100k-doc scale: $nDocs")

    // ladder depth on the real corpus
    val tokBase = all.select(col("doc_id").as("doc"),
      TextOps.tokens(col("text")).as("__t")).localCheckpoint()
    val lens = tokBase.select(col("doc"), size(col("__t")).as("len"))
    val bounds = lens.agg(max(col("len")).as("m"),
      sum(col("len").cast("long")).as("n")).head()
    val (maxLen, nPos) = (bounds.getInt(0), bounds.getLong(1))
    assert(nPos > 5000000L, s"must be multi-M tokens: $nPos")
    val t0 = System.nanoTime()
    val levels = SuffixDedup.rankLevels(
      SuffixDedup.prefixFrame(tokBase), maxLen, nPos)
    val ladderSecs = (System.nanoTime() - t0) / 1e9
    val expectedRounds = // quadrupled ladder (r20): log4, not log2
      math.ceil(math.log(maxLen.toDouble / SuffixDedup.BaseLen) / math.log(4)).toInt
    info(s"maxLen=$maxLen nPos=$nPos ladder=${levels.map(_._1)} in ${ladderSecs.round} s")
    assert(levels.size == 1 + expectedRounds,
      s"ladder ${levels.map(_._1)} vs expected $expectedRounds rounds for maxLen=$maxLen")

    // exactness: the planted repeats return their precise merged spans
    val t1 = System.nanoTime()
    val spans = SuffixDedup
      .duplicatedSpans(all, "doc_id", "text", minTokens = 50)
    val plantedSpans = spans.filter(col("doc_id") >= 900000000L)
      .select("doc_id", "span_start", "span_end", "span_tokens")
      .as[(Long, Int, Int, Int)].collect().toSet
    val spanSecs = (System.nanoTime() - t1) / 1e9
    info(s"spans in ${spanSecs.round} s; planted=$plantedSpans")
    assert(plantedSpans == Set(
      (900000001L, 0, 300, 300), (900000002L, 3, 303, 300)),
      s"planted deep repeats must be exact: $plantedSpans")
    assert(ladderSecs + spanSecs < 900, // measured 553 s on a quiet host
      s"suffix pipeline blew up at scale: ${ladderSecs + spanSecs} s")
    all.unpersist()
  }
}
