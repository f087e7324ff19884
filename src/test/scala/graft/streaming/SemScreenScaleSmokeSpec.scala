package graft.streaming

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Opt-in scale smoke for the self-accumulating SEMANTIC screen (set
  * GRAFT_SCALE_SMOKE=1): three ~10k-vector micro-batches flow through
  * [[CorpusStreams.semanticScreenBatch]] with the bucketed saved
  * state, planted cross-batch paraphrase copies (rescaled vectors —
  * cosine is scale-invariant, so a rescaled copy is the exact
  * embedding-space analog of a reflowed re-crawl). Asserts:
  *   - CROSS-BATCH SCREEN AT SCALE: every planted copy of an earlier
  *     batch's KEPT vector drops; all fresh vectors survive;
  *   - STATE SANITY: the assignment table holds each kept doc ONCE
  *     (the (g, doc) membership anti-join never double-folds);
  *   - ERASURE AT SCALE: a 500-doc erase removes exactly its rows and
  *     re-admits a copy of an erased vector while a survivor's copy
  *     still drops;
  *   - WALL CLOCK: generous cap — the guarded failure mode is a
  *     per-batch state re-shuffle or a quadratic probe (minutes), not
  *     percent.
  * Inputs are parquet-backed (the CurateScaleSmoke gotcha:
  * generator-backed frames carry tiny size estimates that bait AQE).
  * Vectors are deterministic PSEUDO-RANDOM dense 32-dim points: for
  * random directions at this dimension the cosine concentration bound
  * puts P(cos ≥ 0.95) ≈ (1−0.95²)^15 ≈ 1e-15 per pair — across the
  * ~1e8 cross-batch pairs no unplanted drop can occur, so the planted
  * rescaled copies (cosine exactly 1, scale-invariant) are the ONLY
  * duplicates by construction. */
class SemScreenScaleSmokeSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.contains("GRAFT_SCALE_SMOKE")
  private def smokeTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  smokeTest("semantic screen: 3 x 10k-vector batches, cross-batch paraphrase drops, erasure, bounded wall clock") {
    val tmp = java.nio.file.Files
      .createTempDirectory("graft_sem_scale").toString
    val (stateRoot, outRoot) = (tmp + "/state", tmp + "/out")
    val dim = 32
    // deterministic pseudo-random dense vector for doc i of batch b —
    // see the class doc on why random directions cannot collide at
    // the 0.95 floor
    def vec(b: Int, i: Int): Array[Float] = {
      val rnd = new scala.util.Random(b * 1000003L + i)
      Array.fill(dim)(rnd.nextFloat() * 2.0f - 1.0f)
    }
    def mkBatch(b: Int): org.apache.spark.sql.DataFrame = {
      val rows = (0 until 10000).map { i =>
        val id = b * 100000L + i
        // 500 paraphrase re-crawls per later batch: rescaled copies of
        // the PREVIOUS batch's docs [1000, 1500) — cosine exactly 1
        if (b > 0 && i < 500)
          (id, vec(b - 1, i + 1000).map(_ * 1.5f).toSeq)
        else (id, vec(b, i).toSeq)
      }
      val path = s"$tmp/in_$b"
      rows.toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
        .repartition(8).write.mode("overwrite").parquet(path)
      spark.read.parquet(path)
    }
    val t0 = System.nanoTime()
    (0 until 3).foreach { b =>
      CorpusStreams.semanticScreenBatch(mkBatch(b), b.toLong, stateRoot,
        outRoot, nCenters = 64, floor = 0.95)
    }
    val wallSec = (System.nanoTime() - t0) / 1e9
    val out = spark.read.parquet(outRoot)
      .select(col("batch_id").cast("long"), col("vec_id").cast("long"))
      .as[(Long, Long)].collect()
    val byBatch = out.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._2).toSet }
    // batch 0 keeps everything (empty state)
    assert(byBatch(0L).size == 10000)
    // later batches: every planted copy drops, everything else survives
    Seq(1L, 2L).foreach { b =>
      val planted = (0 until 500).map(i => b * 100000L + i).toSet
      assert(byBatch(b).intersect(planted).isEmpty,
        s"batch $b: all ${planted.size} planted paraphrase copies must drop")
      assert(byBatch(b).size == 9500,
        s"batch $b: the 9500 fresh vectors must all survive, got ${byBatch(b).size}")
    }
    // state holds each kept doc exactly once
    val state = graft.ext.SemDedup.savedSemanticAssigned(spark, stateRoot)
    assert(state.count() == 29000L, "3 batches kept 10000 + 9500 + 9500")
    assert(state.groupBy("doc").agg(count(lit(1)).as("n"))
      .filter(col("n") > 1).isEmpty, "no doc may fold twice")
    // erasure at scale: drop 500 batch-0 docs, then a copy of an
    // erased vector re-admits while a survivor's copy still drops
    graft.ext.SemDedup.deleteDocsFromSavedSemanticState(stateRoot,
      (2000L until 2500L).toDF("vec_id"), "vec_id")
    assert(graft.ext.SemDedup.savedSemanticAssigned(spark, stateRoot)
      .count() == 28500L, "exactly the erased rows leave")
    val reprobe = graft.ext.SemDedup.newAgainstSavedSemantic(
      Seq(
        (900001L, vec(0, 2100).map(_ * 2.0f).toSeq),  // copy of ERASED
        (900002L, vec(0, 3100).map(_ * 2.0f).toSeq))  // copy of SURVIVOR
        .toDF("vec_id", "embedding")
        .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding")),
      stateRoot, "vec_id", "embedding", floor = 0.95, batchId = 9L)
      .select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(reprobe == Set(900001L),
      s"erased vector's copy must re-admit, survivor's must drop: $reprobe")
    info(f"3x10k semantic screen + 500-doc erase wall clock: $wallSec%.1f s")
    assert(wallSec < 300.0,
      f"semantic screen smoke took $wallSec%.1f s — a state re-shuffle " +
        "or quadratic probe regression, not host noise")
  }
}
