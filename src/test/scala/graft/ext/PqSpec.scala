package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PqSpec extends SparkSpec {
  import spark.implicits._

  private lazy val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")

  test("encode: m codes per vector, every code inside its codebook") {
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    assert(model.m == 4 && model.k == 8 && model.subDim == 16)
    val enc = Pq.encode(model, e, "vec_id", "embedding")
      .select("codes").as[Seq[Int]].collect()
    assert(enc.nonEmpty)
    assert(enc.forall(c => c.length == 4 && c.forall(j => j >= 0 && j < 8)))
  }

  test("full-coverage candidates ≡ exact brute-force topK") {
    // candidateFactor covering the corpus ⇒ the exact rerank sees
    // every vector ⇒ output must equal Similarity.topK row for row
    // (the topKQuantizedRerank identity argument)
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    val enc = Pq.encode(model, e, "vec_id", "embedding")
    val q = e.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    val full = rows(Pq.searchTopK(model, enc, e, q, "vec_id", "embedding",
      k = 5, candidateFactor = 200))
    val brute = rows(Similarity.topK(e, q, "vec_id", "embedding", k = 5))
    assert(full == brute)
  }

  test("zero-norm vectors drop from encode; dim must split into m") {
    val mixed = ((1L, Array.fill(8)(1.0f)) +: (2L, Array.fill(8)(0.0f)) +:
      (3L to 12L).map(i => (i, Array.tabulate(8)(d =>
        math.sin(i * 2.7 + d).toFloat)))).toDF("vec_id", "embedding")
    val model = Pq.train(mixed, "embedding", dim = 8, m = 2, k = 2,
      fitSampleFraction = 1.0)
    val enc = Pq.encode(model, mixed, "vec_id", "embedding")
      .select("vec_id").as[Long].collect().toSet
    assert(enc == ((1L to 12L).toSet - 2L),
      "the zero vector has no direction to code")
    intercept[IllegalArgumentException] {
      Pq.train(mixed, "embedding", dim = 8, m = 3, k = 2)
    }
  }

  test("save/load: a reloaded model codes and searches identically") {
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    val path = java.nio.file.Files.createTempDirectory("graft-pq").toString + "/model"
    Pq.save(spark, model, path)
    val back = Pq.load(spark, path)
    assert(back.m == model.m && back.k == model.k)
    assert(back.codebooks.flatten.map(_.toSeq).toSeq ==
      model.codebooks.flatten.map(_.toSeq).toSeq)
    val a = Pq.encode(model, e, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toSet
    val b = Pq.encode(back, e, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toSet
    assert(a == b, "reloaded codebooks must encode identically")
  }

  test("streamed appendToSaved ingest: codes layout equals all-at-once encode") {
    implicit val sqlCtx = spark.sqlContext
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    val base = e.filter(col("vec_id") % 5 =!= 0)
    val root = java.nio.file.Files.createTempDirectory("graft-pq-app").toString
    Pq.saveEncoded(spark, model, base, "vec_id", "embedding", root)
    // the held-out 20% arrives as TWO micro-batches of an embedding
    // stream; each encodes against the SAVED codebooks and appends
    // (the Ivf.appendToSaved pattern) — one batch deliberately arrives
    // as array<double> to exercise the schema normalization
    val held = e.filter(col("vec_id") % 5 === 0)
      .select(col("vec_id"), col("embedding")).as[(Long, Seq[Float])]
      .collect()
    val (b1, b2) = held.splitAt(held.length / 2)
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, Seq[Float])]
    val q = input.toDF().toDF("vec_id", "embedding")
      .writeStream.foreachBatch {
        (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], id: Long) =>
          Pq.appendToSaved(spark, root,
            batch.toDF().select(col("vec_id"),
              col("embedding").cast(
                if (id % 2 == 0) "array<float>" else "array<double>")
                .as("embedding")),
            "vec_id", "embedding")
      }.start()
    try {
      input.addData(b1: _*); q.processAllAvailable()
      input.addData(b2: _*); q.processAllAvailable()
    } finally q.stop()
    val (backModel, codes) = Pq.loadEncoded(spark, root)
    assert(backModel.codebooks.flatten.map(_.toSeq).toSeq ==
      model.codebooks.flatten.map(_.toSeq).toSeq)
    val appended = codes.as[(Long, Seq[Int])].collect().toSet
    val direct = Pq.encode(model, e, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toSet
    assert(appended == direct,
      "streamed-in codes layout must equal the all-at-once encode")
    // and the searchable contract holds: search over the appended
    // layout ≡ search over a fresh full encode
    val queries = e.filter(col("vec_id") < 3)
    def rows(enc: org.apache.spark.sql.DataFrame) =
      Pq.searchTopK(model, enc, e, queries, "vec_id", "embedding",
          k = 5, candidateFactor = 200)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows(codes) == rows(Pq.encode(model, e, "vec_id", "embedding")))
  }

  test("ivf save/load: reloaded index searches identically") {
    val index = Ivf.build(e, "vec_id", "embedding", nClusters = 8)
    val root = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    Ivf.save(index, root)
    val back = Ivf.load(spark, root)
    assert(back.centroids.map(_.toSeq).toSeq ==
      index.centroids.map(_.toSeq).toSeq)
    val q = e.filter(org.apache.spark.sql.functions.col("vec_id") < 3)
    def rows(i: Ivf.Index) =
      Ivf.searchTopK(i, q, "vec_id", "embedding", k = 5, nprobe = 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    assert(rows(back) == rows(index), "reloaded index must search identically")
  }

  test("zero-norm queries drop from searchTopK (no NaN ranks)") {
    val mixed = ((1L, Array.fill(8)(0.0f)) +:
      (2L to 13L).map(i => (i, Array.tabulate(8)(d =>
        math.cos(i * 1.9 + d).toFloat)))).toDF("vec_id", "embedding")
    val model = Pq.train(mixed, "embedding", dim = 8, m = 2, k = 2,
      fitSampleFraction = 1.0)
    val enc = Pq.encode(model, mixed, "vec_id", "embedding")
    val out = Pq.searchTopK(model, enc, mixed,
        mixed.filter(col("vec_id") <= 2), "vec_id", "embedding", k = 3)
      .select("query_id", "cosine").as[(Long, Double)].collect()
    assert(out.nonEmpty && out.forall(_._1 == 2L),
      "the zero-norm query has no direction to search")
    assert(out.forall(r => !r._2.isNaN))
  }

  test("bench forms: deployed search plans return ranked neighbors") {
    // the SparkEntry.benchForm entries (r11 VERDICT #1): once-trained
    // save/load-persisted model, truth twin stripped — assert they
    // produce the same neighbor sets as the in-memory trained model
    val dir = "/root/testdata/sf0.001"
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().sortBy(r => (r._1, r._3)).toSeq
    val pqBench = rows(graft.Queries.similarityPqBenchForm(spark, dir))
    val model = Pq.train(e, "embedding", dim = 64, m = 8, k = 16)
    val enc = Pq.encode(model, e, "vec_id", "embedding")
    val pqDirect = rows(Pq.searchTopK(model, enc, e,
      e.filter(col("vec_id") < 5), "vec_id", "embedding",
      k = 5, candidateFactor = 20))
    assert(pqBench == pqDirect,
      "save/load round-trip must not change the search result")
    val ivfBench = rows(graft.Queries.similarityIvfKmeansBenchForm(spark, dir))
    val index = Ivf.build(e, "vec_id", "embedding", nClusters = 8)
    val ivfDirect = rows(Ivf.searchTopK(index,
      e.filter(col("vec_id") < 5), "vec_id", "embedding", k = 5, nprobe = 2))
    assert(ivfBench == ivfDirect)
  }

  test("unit normalization makes scale-invariant codes") {
    // v and 10·v point the same way ⇒ identical codes
    val pair = Seq((1L, Array(1.0f, 2.0f, 3.0f, 4.0f)),
      (2L, Array(10.0f, 20.0f, 30.0f, 40.0f)),
      (3L, Array(-4.0f, 3.0f, -2.0f, 1.0f))).toDF("vec_id", "embedding")
    val model = Pq.train(pair, "embedding", dim = 4, m = 2, k = 2,
      fitSampleFraction = 1.0)
    val codes = Pq.encode(model, pair, "vec_id", "embedding")
      .as[(Long, Seq[Int])].collect().toMap
    assert(codes(1L) == codes(2L), s"scale must not change codes: $codes")
  }

  test("pq deleteFromSaved: codes rows leave, survivors search exactly, swap crash heals, idempotent") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pq_del").toString + "/pq"
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    Pq.saveEncoded(spark, model, e.filter(col("vec_id") % 2 === 0),
      "vec_id", "embedding", root)
    Pq.appendToSaved(spark, root, e.filter(col("vec_id") % 2 =!= 0),
      "vec_id", "embedding")
    val del = e.filter(col("vec_id") % 7 === 0).select("vec_id")
    val delIds = del.as[Long].collect().toSet
    Pq.deleteFromSaved(spark, root, del, "vec_id")
    val (reloaded, codes) = Pq.loadEncoded(spark, root)
    val ids = codes.select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(ids.intersect(delIds).isEmpty, "erased ids must leave the codes")
    assert(ids == e.select($"vec_id").as[Long].collect().toSet.diff(delIds),
      "every survivor's codes must remain")
    // full-coverage search over the erased layout ≡ brute force over
    // the survivors (the catalog query's construction)
    val survivors = e.filter(col("vec_id") % 7 =!= 0)
    val queries = e.filter(col("vec_id") < 3 && col("vec_id") % 7 =!= 0)
    val factor = math.max(1L, (ids.size.toLong + 4L) / 5L).toInt
    val got = Pq.searchTopK(reloaded, codes, survivors, queries,
        "vec_id", "embedding", k = 5, candidateFactor = factor)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    val brute = Similarity.topK(survivors, queries, "vec_id", "embedding",
        k = 5)
      .select("query_id", "neighbor_id", "cosine", "rank")
      .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
    assert(got.toSeq == brute.toSeq)
    // idempotent: re-delivering the erase changes nothing
    Pq.deleteFromSaved(spark, root, del, "vec_id")
    assert(Pq.loadEncoded(spark, root)._2.count() == ids.size.toLong)
    // swap crash between the two renames: codes moved aside, nothing
    // renamed in — the next load heals and reads the full codes back
    val cPath = new org.apache.hadoop.fs.Path(s"$root/codes")
    val fs = cPath.getFileSystem(spark.sessionState.newHadoopConf())
    val aside = new org.apache.hadoop.fs.Path(cPath.getParent,
      "." + cPath.getName + ".swap_old")
    assert(fs.rename(cPath, aside), "fixture: move the codes aside")
    assert(Pq.loadEncoded(spark, root)._2.count() == ids.size.toLong,
      "a crashed swap must heal on load, never read as missing codes")
    assert(fs.exists(cPath) && !fs.exists(aside))
  }

  test("stale .swap_old beside a live codes root purges on recovery — erased rows leave no hidden copy (r18 ADVICE)") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pq_aside").toString + "/pq"
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    Pq.saveEncoded(spark, model, e, "vec_id", "embedding", root)
    val cPath = new org.apache.hadoop.fs.Path(s"$root/codes")
    val fs = cPath.getFileSystem(spark.sessionState.newHadoopConf())
    val aside = new org.apache.hadoop.fs.Path(cPath.getParent,
      "." + cPath.getName + ".swap_old")
    // snapshot the PRE-erase codes (the deleted rows included), then
    // erase, then plant the snapshot as the aside sibling — exactly
    // what a crash between swapInState's rename-in and its final
    // aside-delete leaves behind: the erased rows' last on-disk copy
    val preErase = new org.apache.hadoop.fs.Path(
      cPath.getParent, "pre_erase_snapshot")
    spark.read.parquet(cPath.toString).write.parquet(preErase.toString)
    val del = e.filter(col("vec_id") % 7 === 0).select("vec_id")
    Pq.deleteFromSaved(spark, root, del, "vec_id")
    val survivors = Pq.loadEncoded(spark, root)._2.count()
    assert(fs.rename(preErase, aside), "fixture: plant the stale aside")
    // any next touch purges the residue: the swap already committed
    // (the root IS the post-erase state), so right-to-erasure finishes
    val (_, codes) = Pq.loadEncoded(spark, root)
    assert(!fs.exists(aside),
      "a stale .swap_old beside a live root must purge on recovery")
    assert(codes.count() == survivors, "the live codes stay post-erase")
    assert(codes.filter(col("vec_id") % 7 === 0).isEmpty,
      "no erased row may resurface")
  }

  test("compactSaved: fewer code files, byte-identical search, appends and erase still work (r18 VERDICT #5)") {
    import spark.implicits._
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val root = java.nio.file.Files
      .createTempDirectory("graft_pq_compact").toString + "/pq"
    val model = Pq.train(e, "embedding", dim = 64, m = 4, k = 8)
    Pq.saveEncoded(spark, model, e.filter(col("vec_id") % 4 === 0),
      "vec_id", "embedding", root)
    // three appended batches — one parquet file set each, the accrual
    // compaction exists to mop up
    (1 to 3).foreach { r =>
      Pq.appendToSaved(spark, root, e.filter(col("vec_id") % 4 === r),
        "vec_id", "embedding")
    }
    val cPath = new org.apache.hadoop.fs.Path(s"$root/codes")
    val fs = cPath.getFileSystem(spark.sessionState.newHadoopConf())
    def dataFiles(): Int = fs.listStatus(cPath)
      .count(s => s.isFile && s.getPath.getName.endsWith(".parquet"))
    val queries = e.filter(col("vec_id") < 3)
    def search(): Seq[(Long, Long, Double, Int)] = {
      val (m, codes) = Pq.loadEncoded(spark, root)
      Pq.searchTopK(m, codes, e, queries, "vec_id", "embedding",
          k = 5, candidateFactor = 200)
        .select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4))
        .toSeq
    }
    val before = search()
    val filesBefore = dataFiles()
    assert(filesBefore >= 4, s"fixture needs fragmented codes, got $filesBefore")
    Pq.compactSaved(spark, root)
    assert(dataFiles() == 1,
      s"tiny codes must compact to ONE file, got ${dataFiles()}")
    assert(search() == before,
      "compaction moves rows between files, never changes search results")
    // re-running on an already-compact layout is a no-op
    val mtime = fs.listStatus(cPath).map(_.getModificationTime).max
    Pq.compactSaved(spark, root)
    assert(fs.listStatus(cPath).map(_.getModificationTime).max == mtime,
      "a second compaction over a compact layout must not rewrite")
    // the layout stays live: erasure stays exact, and a post-
    // compaction append lands (the erased rows come back as a batch)
    val del = e.filter(col("vec_id") % 7 === 0).select("vec_id")
    Pq.deleteFromSaved(spark, root, del, "vec_id")
    val all = e.select($"vec_id").as[Long].collect().toSet
    val ids = Pq.loadEncoded(spark, root)._2
      .select(col("vec_id").cast("long")).as[Long].collect().toSet
    assert(ids == all.diff(del.as[Long].collect().toSet))
    Pq.appendToSaved(spark, root, e.filter(col("vec_id") % 7 === 0),
      "vec_id", "embedding")
    assert(Pq.loadEncoded(spark, root)._2
      .select(col("vec_id").cast("long")).as[Long].collect().toSet == all,
      "a post-compaction append must land in the compacted layout")
  }
}
