package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[HeavyHitters]]: the Misra–Gries summary guarantee (no false
  * negatives, one-sided error ≤ n/(k+1) after merging) across
  * partitionings, the exact partitioning-independent output of the
  * two-pass form, the eviction path, and the null/empty edges.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish stream: key i contributes ~ 2000/i rows (i = 1..40), so
  // a handful of keys clear the n/(k+1) bar at k=5 and most do not;
  // 40 distinct keys >> 5 counters forces constant evictions.
  private def zipf(): Seq[String] = {
    val rows = for {
      i <- 1 to 40
      j <- 1 to (2000 / i)
    } yield (s"k$i", i * 100000 + j)
    // deterministic interleave so hot keys are spread, not clustered
    rows.sortBy { case (_, ord) => (ord % 997, ord) }.map(_._1)
  }

  test("summarize: merged summaries keep the MG guarantee under every partitioning") {
    val data = zipf()
    val n = data.size.toLong
    val exact = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val k = 5
    for (parts <- Seq(1, 3, 8, 32)) {
      val df = data.toDF("word").repartition(parts)
      val merged = HeavyHitters.summarize(df, "word", k)
        .where(col("key").isNotNull)
        .groupBy("key").agg(sum("est").as("est"))
        .as[(String, Long)].collect().toMap
      val np = HeavyHitters.summarize(df, "word", k)
        .where(col("key").isNull).agg(sum("np")).head().getLong(0)
      assert(np == n, s"partition totals must sum to n ($np vs $n)")
      merged.foreach { case (key, est) =>
        val f = exact(key)
        assert(est <= f, s"$key: est $est > true $f (MG never overcounts)")
        assert((f - est) * (k + 1) <= n,
          s"$key: deficit ${f - est} exceeds n/(k+1) at parts=$parts")
      }
      // no false negatives: every true heavy hitter survives
      exact.foreach { case (key, f) =>
        if (f * (k + 1) > n)
          assert(merged.contains(key),
            s"true heavy hitter $key (f=$f, n=$n) missing at parts=$parts")
      }
    }
  }

  test("heavyHitters: exact output, independent of partitioning") {
    val data = zipf()
    val n = data.size.toLong
    val k = 5
    val expected = data.groupBy(identity)
      .collect { case (key, v) if v.size.toLong * (k + 1) > n =>
        key -> v.size.toLong }
      .toMap
    assert(expected.nonEmpty && expected.size < 40, "fixture sanity")
    for (parts <- Seq(1, 8, 32)) {
      val got = HeavyHitters
        .heavyHitters(data.toDF("word").repartition(parts), "word", k)
        .select("word", "cnt").as[(String, Long)].collect().toMap
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
  }

  test("updateSavedSummary: the running lake summary keeps the whole-stream " +
      "guarantee across batches and stays <= k counters") {
    val data = zipf()
    val n = data.size.toLong
    val exact = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val k = 5
    val root = java.nio.file.Files
      .createTempDirectory("graft_hh_state").toString + "/summary"
    // five uneven micro-batches in stream order
    val chunks = data.grouped(data.size / 5 + 1).toSeq
    chunks.foreach { c =>
      graft.ext.HeavyHitters.updateSavedSummary(root, c.toDF("word"), "word", k)
    }
    val saved = spark.read.parquet(root)
    val counters = saved.where(col("key").isNotNull)
      .as[(String, Long, Long)].collect().map(r => r._1 -> r._2).toMap
    val nSaved = saved.where(col("key").isNull).agg(sum("np")).head().getLong(0)
    assert(nSaved == n, s"saved total must track the stream ($nSaved vs $n)")
    assert(counters.size <= k, s"merge prune must keep <= k counters: $counters")
    counters.foreach { case (key, est) =>
      val f = exact(key)
      assert(est <= f, s"$key: merged est $est > true $f")
      assert((f - est) * (k + 1) <= n, s"$key: merged deficit exceeds n/(k+1)")
    }
    exact.foreach { case (key, f) =>
      if (f * (k + 1) > n)
        assert(counters.contains(key),
          s"whole-stream heavy hitter $key lost across batch merges")
    }
  }

  test("heavyHitterSummaryStream: the streamed state keeps the guarantee " +
      "(summary contents are partition-layout-dependent; the BOUND is the contract)") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val tmp = java.nio.file.Files.createTempDirectory("graft_hh_stream")
    val rootStream = s"$tmp/stream"
    val b1 = Seq((1L, "the the the quick fox"), (2L, "the lazy dog"))
    val b2 = Seq((3L, "the quick quick brown fox fox"), (4L, "dog"))
    val input = MemoryStream[(Long, String)]
    val q = graft.streaming.CorpusStreams.heavyHitterSummaryStream(
      input.toDF().toDF("doc_id", "text"), rootStream, k = 3).start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val toks = (b1 ++ b2).flatMap(_._2.split(' '))
    val exact = toks.groupBy(identity).map { case (w, v) => (w, v.size.toLong) }
    val n = toks.size.toLong
    val state = spark.read.parquet(rootStream)
      .as[(String, Long, Long)].collect()
    val counters = state.collect { case (w, est, _) if w != null => w -> est }.toMap
    assert(state.collectFirst { case (null, _, np) => np }.contains(n),
      s"saved total must track the stream: $state")
    assert(counters.size <= 3)
    counters.foreach { case (w, est) =>
      assert(est <= exact(w) && (exact(w) - est) * 4 <= n,
        s"$w: streamed est $est out of bound vs ${exact(w)} (n=$n)")
    }
    // 'the' carries 5/15 > n/(k+1): must survive any batch/partition layout
    assert(counters.contains("the"), s"dominant token lost: $counters")
  }

  test("null keys are excluded; empty input yields empty output") {
    val df = Seq(Some("a"), None, Some("a"), None, None).toDF("word")
    // nulls don't count toward n (3 nulls dropped, n=2) and never
    // surface as a key
    val out = HeavyHitters.heavyHitters(df, "word", 4)
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", 2L, 1.0)))
    val empty = HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("word"), "word", 4)
    assert(empty.count() == 0)
  }

  test("non-string keys ride the summary schema") {
    val df = (1 to 100).map(i => if (i <= 60) 7L else i.toLong).toDF("user_id")
    val out = HeavyHitters.heavyHitters(df, "user_id", 3)
      .select("user_id", "cnt").as[(Long, Long)].collect().toMap
    assert(out == Map(7L -> 60L))
  }
}
