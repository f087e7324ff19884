package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Saved mergeable sketch state (r13 VERDICT #3): HLL registers and
  * GK summaries persisted under a lake root, merged per micro-batch,
  * answering distinct-count / quantile queries WITHOUT rescanning the
  * accumulated lake — parity with HeavyHitters.updateSavedSummary.
  */
class SketchStateSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory(s"graft_sketch_$name").toString + "/state"

  test("HLL: saved state after N batches ≡ the one-shot sketch over the union") {
    val all = (1L to 3000L).map(i => i * 7919L % 100000L).distinct
    val batches = all.grouped(700).toSeq
    val root = tmp("hll")
    batches.foreach(b =>
      SketchState.updateSavedHll(root, b.toDF("k"), "k"))
    val saved = spark.read.parquet(root)
      .select("reg_idx", "max_rank").as[(Long, Long)].collect().toSet
    val oneShot = SketchState.hllRegisters(all.toDF("k"), "k")
      .select("reg_idx", "max_rank").as[(Long, Long)].collect().toSet
    assert(saved == oneShot,
      "elementwise-max merge must make batching invisible")
  }

  test("HLL: estimate from saved state is within the sketch's error bound") {
    val n = 2500
    val keys = (1L to n.toLong).map(i => i * 104729L % 10000000L).distinct
    val root = tmp("hll_est")
    keys.grouped(800).foreach(b =>
      SketchState.updateSavedHll(root, b.toDF("k"), "k"))
    val est = SketchState.hllEstimateFromSaved(spark, root)
      .select("estimate").as[Double].head()
    val exact = keys.size.toDouble
    // rse = 1.04/sqrt(4096) ≈ 1.6%; assert a generous 4x slack
    val slack = 4 * 1.04 / math.sqrt(4096) * exact
    assert(math.abs(est - exact) <= slack,
      s"estimate $est vs exact $exact (slack $slack)")
  }

  test("HLL: duplicate keys across batches never move the registers") {
    val root = tmp("hll_dup")
    SketchState.updateSavedHll(root, (1L to 500L).toDF("k"), "k")
    val before = spark.read.parquet(root)
      .select("reg_idx", "max_rank").as[(Long, Long)].collect().toSet
    SketchState.updateSavedHll(root, (1L to 500L).toDF("k"), "k")
    val after = spark.read.parquet(root)
      .select("reg_idx", "max_rank").as[(Long, Long)].collect().toSet
    assert(before == after, "max-merge must be idempotent")
  }

  test("Bloom: saved state after N batches ≡ one-shot; re-merge idempotent") {
    val all = (1L to 2000L).map(i => i * 6007L % 1000000L).distinct
    val root = tmp("bloom")
    all.grouped(600).foreach(b =>
      SketchState.updateSavedBloom(root, b.toDF("k"), "k"))
    val saved = spark.read.parquet(root)
      .select("word_idx", "bits").as[(Long, Long)].collect().toSet
    val oneShot = SketchState.bloomWords(all.toDF("k"), "k")
      .select("word_idx", "bits").as[(Long, Long)].collect().toSet
    assert(saved == oneShot, "OR-merge must make batching invisible")
    SketchState.updateSavedBloom(root, all.take(600).toDF("k"), "k")
    val again = spark.read.parquet(root)
      .select("word_idx", "bits").as[(Long, Long)].collect().toSet
    assert(again == saved, "OR-merge must be idempotent under replay")
  }

  test("Bloom: no false negatives; disjoint probes mostly rejected") {
    val present = (1L to 1500L).toDF("k")
    val root = tmp("bloom_fp")
    SketchState.updateSavedBloom(root, present, "k")
    val hits = SketchState.bloomMightContainFromSaved(spark, root,
        present, "k")
      .filter(!col("might_contain")).count()
    assert(hits == 0L, "a Bloom filter must never reject an inserted key")
    val absent = (1000001L to 1003000L).toDF("k")
    val fps = SketchState.bloomMightContainFromSaved(spark, root,
        absent, "k")
      .filter(col("might_contain")).count()
    // shape 2^15 bits / 4 lanes at n=1500: FP ≈ (1−e^{−4·1500/32768})⁴
    // ≈ 0.06% — assert a generous 2%
    assert(fps <= 60L, s"false-positive count $fps out of 3000 probes")
  }

  test("HLL overlap: inclusion-exclusion intersection within the rse bound") {
    // |A| = 3000, |B| = 3000, |A ∩ B| = 1000 (keys 2001..3000 shared)
    val a = (1L to 3000L).map(_ * 2654435761L % 100000000L)
    val b = (2001L to 5000L).map(_ * 2654435761L % 100000000L)
    val ra = SketchState.hllRegisters(a.toDF("k"), "k")
    val rb = SketchState.hllRegisters(b.toDF("k"), "k")
    def est(r: org.apache.spark.sql.DataFrame): Double =
      SketchState.hllEstimate(r).select("estimate").as[Double].head()
    val inter = est(ra) + est(rb) - est(SketchState.hllUnion(ra, rb))
    // inclusion-exclusion compounds three estimates: allow 4× rse on
    // the union size (5000), ≈ 325
    assert(math.abs(inter - 1000.0) <= 4 * 1.04 / math.sqrt(4096) * 5000,
      s"intersection estimate $inter vs exact 1000")
  }

  test("CMS join-cardinality: upper bound tight on a collision-free fixture") {
    // true |A ⋈ B| = Σ fA(k)·fB(k) = 3·4 (only "x" is shared) = 12
    val a = (Seq.fill(3)("x") ++ Seq.fill(2)("y")).toDF("k")
    val b = (Seq.fill(4)("x") ++ Seq.fill(5)("z")).toDF("k")
    val out = SketchState.cmsJoinCardinality(
      SketchState.cmsCells(a, "k"), SketchState.cmsCells(b, "k"))
    val est = out.select("est").as[Long].head()
    assert(out.count() == 4L, "one row per lane")
    assert(est >= 12L, "the inner-product estimate never undercounts")
    assert(est <= 32L, s"3 keys in 512 buckets: est $est should be near 12")
  }

  test("CMS join-cardinality: disjoint sides estimate (near) zero") {
    val est = SketchState.cmsJoinCardinality(
        SketchState.cmsCells((1L to 30L).toDF("k"), "k"),
        SketchState.cmsCells((100001L to 100030L).toDF("k"), "k"))
      .select("est").as[Long].head()
    // only accidental bucket collisions contribute; 30×30 keys over
    // 512 buckets × 4 independent lanes keeps the min-lane tiny
    assert(est <= 8L, s"disjoint join estimated at $est")
  }

  test("CMS: saved state after N batches ≡ the one-shot sketch over the stream") {
    val all = (1L to 5000L).map(i => i * 31L % 400L)
    val root = tmp("cms")
    all.grouped(1200).foreach(b =>
      SketchState.updateSavedCms(root, b.toDF("k"), "k"))
    val saved = spark.read.parquet(root)
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    val oneShot = SketchState.cmsCells(all.toDF("k"), "k")
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(saved == oneShot, "cell-wise addition must make batching invisible")
    // mass conservation: every lane holds the full stream
    val perLane = saved.toSeq.groupBy(_._1).view
      .mapValues(_.map(_._3).sum).toMap
    assert(perLane.values.forall(_ == all.size.toLong), s"lane mass: $perLane")
  }

  test("CMS: point estimates from saved state never undercount and stay in bound") {
    val all = (1L to 6000L).map(i => if (i % 3 == 0) 7L else i % 997L)
    val root = tmp("cms_est")
    all.grouped(2000).foreach(b =>
      SketchState.updateSavedCms(root, b.toDF("k"), "k"))
    val truth = all.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val est = SketchState.cmsEstimateFromSaved(spark, root,
        truth.keys.toSeq.toDF("k"), "k")
      .as[(Long, Long)].collect().toMap
    val n = all.size.toLong
    truth.foreach { case (k, t) =>
      assert(est(k) >= t, s"CMS must never undercount: key $k est ${est(k)} < $t")
      // ε = e/512 per-cell expectation; allow a generous 4x
      assert(est(k) - t <= 4 * math.E / 512 * n + 1,
        s"key $k overcounts beyond bound: est ${est(k)} vs $t (n=$n)")
    }
    assert(est(7L) >= 2000L, "the heavy key's estimate must reflect its mass")
  }

  test("streaming HLL + CMS state through foreachBatch ≡ one-shot over the stream") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val hllRoot = tmp("hll_stream"); val cmsRoot = tmp("cms_stream")
    val b1 = (1L to 800L).map(i => i % 300L)
    val b2 = (801L to 1600L).map(i => i % 450L)
    val input = MemoryStream[Long]
    val qh = graft.streaming.CorpusStreams
      .distinctCountStream(input.toDF().toDF("k"), hllRoot, "k").start()
    val input2 = MemoryStream[Long]
    val qc = graft.streaming.CorpusStreams
      .frequencyStream(input2.toDF().toDF("k"), cmsRoot, "k").start()
    try {
      input.addData(b1: _*); input2.addData(b1: _*)
      qh.processAllAvailable(); qc.processAllAvailable()
      input.addData(b2: _*); input2.addData(b2: _*)
      qh.processAllAvailable(); qc.processAllAvailable()
    } finally { qh.stop(); qc.stop() }
    val all = b1 ++ b2
    val hllSaved = spark.read.parquet(hllRoot)
      .as[(Long, Long)].collect().toSet
    val hllOneShot = SketchState.hllRegisters(all.toDF("k"), "k")
      .as[(Long, Long)].collect().toSet
    assert(hllSaved == hllOneShot, "streamed HLL state must equal one-shot")
    val cmsSaved = spark.read.parquet(cmsRoot)
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    val cmsOneShot = SketchState.cmsCells(all.toDF("k"), "k")
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(cmsSaved == cmsOneShot, "streamed CMS state must equal one-shot")
  }

  test("streaming Bloom state through foreachBatch ≡ one-shot; screens from state") {
    implicit val sqlCtx = spark.sqlContext
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val root = tmp("bloom_stream")
    val b1 = (1L to 700L); val b2 = (500L to 1200L) // overlapping batches
    val input = MemoryStream[Long]
    val q = graft.streaming.CorpusStreams
      .membershipStream(input.toDF().toDF("k"), root, "k").start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally { q.stop() }
    val saved = spark.read.parquet(root)
      .as[(Long, Long)].collect().toSet
    val oneShot = SketchState.bloomWords((b1 ++ b2).toDF("k"), "k")
      .as[(Long, Long)].collect().toSet
    assert(saved == oneShot, "streamed Bloom state must equal one-shot")
    val screened = SketchState.bloomMightContainFromSaved(spark, root,
        (1L to 1200L).toDF("k"), "k")
      .filter(!col("might_contain")).count()
    assert(screened == 0L, "every streamed key must screen as present")
  }

  test("GK: saved summary round-trips bit-for-bit") {
    val df = (1 to 5000).map(i => (i * 31 % 997).toDouble).toDF("v")
    val summ = SketchState.gkSummarize(df, "v", eps = 0.01)
    val root = tmp("gk_rt")
    SketchState.saveGk(spark, summ, root)
    val loaded = SketchState.loadGk(spark, root)
    assert(loaded.count == summ.count &&
      loaded.relativeError == summ.relativeError &&
      loaded.sampled.toSeq == summ.sampled.toSeq,
      "persisted (value, g, delta) triples must rebuild exactly")
    assert(loaded.query(0.5) == summ.query(0.5))
  }

  test("GK: state merged over N batches answers within the rank guarantee") {
    // deterministic skewed-ish values; exact ranks computed directly
    val all = (1 to 20000).map(i => ((i * 48271L) % 19991).toDouble)
    val eps = 0.01
    val root = tmp("gk_merge")
    all.grouped(3000).foreach(b =>
      SketchState.updateSavedGk(root, b.toDF("v"), "v", eps))
    val state = SketchState.loadGk(spark, root)
    assert(state.count == all.size.toLong,
      "merged count must track the stream exactly")
    val sorted = all.sorted
    val n = all.size
    for (q <- Seq(0.1, 0.25, 0.5, 0.75, 0.9, 0.99)) {
      val ans = state.query(q).get
      // rank of the answer in the union (count ≤ ans)
      val rank = sorted.count(_ <= ans)
      val target = q * n
      // GK guarantee eps·n per summary; merging keeps it — allow the
      // worst-case doubled-eps slack across the merge chain
      assert(math.abs(rank - target) <= 2 * eps * n + 1,
        s"q=$q answer=$ans rank=$rank target=$target")
    }
  }

  test("GK: quantile answers come from the saved state, not the lake") {
    // sanity of the no-rescan contract: the state alone (no source
    // data in scope) answers; a later batch shifts the answer
    val root = tmp("gk_shift")
    SketchState.updateSavedGk(root, (1 to 1000).map(_.toDouble).toDF("v"), "v")
    val p50a = SketchState.loadGk(spark, root).query(0.5).get
    SketchState.updateSavedGk(root,
      (100001 to 103000).map(_.toDouble).toDF("v"), "v")
    val p50b = SketchState.loadGk(spark, root).query(0.5).get
    assert(p50a <= 1000.0 && p50b >= 100000.0,
      s"median must move with the merged stream: $p50a -> $p50b")
  }

  test("CMS: a replayed micro-batch is skipped, not double-counted (r14 ADVICE #1)") {
    val root = tmp("cms_replay")
    val b0 = (1L to 900L).map(_ % 100L); val b1 = (1L to 600L).map(_ % 150L)
    SketchState.updateSavedCms(root, b0.toDF("k"), "k", batchId = Some(0L))
    SketchState.updateSavedCms(root, b1.toDF("k"), "k", batchId = Some(1L))
    val after = spark.read.parquet(root)
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    // at-least-once delivery: foreachBatch re-runs batch 1 after a
    // failure — the additive merge must NOT fold it in twice
    SketchState.updateSavedCms(root, b1.toDF("k"), "k", batchId = Some(1L))
    SketchState.updateSavedCms(root, b0.toDF("k"), "k", batchId = Some(0L))
    val replayed = spark.read.parquet(root)
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(replayed == after, "replayed batch ids must be no-ops")
    assert(SketchState.lastAppliedBatchId(spark, root).contains(1L))
    // the one-shot equality claim survives the replay
    val oneShot = SketchState.cmsCells((b0 ++ b1).toDF("k"), "k")
      .select("lane", "bucket", "cnt").as[(Int, Long, Long)].collect().toSet
    assert(replayed == oneShot, "state after replays ≡ one-shot over the stream")
    // a NEW batch still folds
    SketchState.updateSavedCms(root, Seq(1L).toDF("k"), "k", batchId = Some(2L))
    assert(SketchState.lastAppliedBatchId(spark, root).contains(2L))
  }

  test("MG heavy-hitter state: replayed micro-batch skipped, n not inflated") {
    val root = tmp("mg_replay")
    val b0 = Seq.fill(50)("a") ++ Seq.fill(30)("b") ++ (1 to 40).map("x" + _)
    val b1 = Seq.fill(40)("a") ++ (1 to 20).map("y" + _)
    HeavyHitters.updateSavedSummary(root, b0.toDF("k"), "k", k = 4,
      batchId = Some(0L))
    HeavyHitters.updateSavedSummary(root, b1.toDF("k"), "k", k = 4,
      batchId = Some(1L))
    def streamN: Long = spark.read.parquet(root)
      .filter(col("key").isNull).select("np").as[Long].head()
    val n = streamN
    assert(n == (b0.size + b1.size).toLong, s"stream count $n")
    HeavyHitters.updateSavedSummary(root, b1.toDF("k"), "k", k = 4,
      batchId = Some(1L)) // replay
    assert(streamN == n, "MG merge is additive — a replayed batch must skip")
  }

  test("saved state survives a crash between the swap renames (r14 ADVICE #2)") {
    val root = tmp("hll_crash")
    SketchState.updateSavedHll(root, (1L to 800L).toDF("k"), "k")
    val before = spark.read.parquet(root)
      .select("reg_idx", "max_rank").as[(Long, Long)].collect().toSet
    // simulate the mid-swap crash window: prior state moved aside, new
    // copy never renamed in — the root is GONE
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val aside = new org.apache.hadoop.fs.Path(
      rootPath.getParent, "." + rootPath.getName + ".swap_old")
    assert(fs.rename(rootPath, aside) && !fs.exists(rootPath))
    // the next touch heals: merge sees the recovered prior state
    SketchState.updateSavedHll(root, (1L to 800L).toDF("k"), "k")
    val after = spark.read.parquet(root)
      .select("reg_idx", "max_rank").as[(Long, Long)].collect().toSet
    assert(after == before,
      "recovery must restore the aside copy (idempotent re-merge proves it)")
    assert(!fs.exists(aside), "the aside copy is consumed by recovery")
  }

  test("GK state survives a mid-swap crash; sampled+meta move as one unit") {
    val root = tmp("gk_crash")
    SketchState.updateSavedGk(root, (1 to 2000).map(_.toDouble).toDF("v"), "v")
    val before = SketchState.loadGk(spark, root)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sessionState.newHadoopConf())
    val rootPath = new org.apache.hadoop.fs.Path(root)
    val aside = new org.apache.hadoop.fs.Path(
      rootPath.getParent, "." + rootPath.getName + ".swap_old")
    assert(fs.rename(rootPath, aside))
    val recovered = SketchState.loadGk(spark, root) // reader-side recovery
    assert(recovered.count == before.count &&
      recovered.sampled.toSeq == before.sampled.toSeq,
      "loadGk must heal and rebuild the pre-crash summary exactly")
  }
}
