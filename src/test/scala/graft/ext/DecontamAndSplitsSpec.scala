package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DecontamAndSplitsSpec extends SparkSpec {
  import spark.implicits._

  // --------------------------------------------------------- decontam

  private val bench = Seq(
    (100L, "what is the capital of france paris obviously")
  ).toDF("doc_id", "text")

  private val train = Seq(
    (1L, "leaked what is the capital of france paris obviously end"),  // contains the benchmark
    (2L, "the capital of france has great food"),                      // short partial overlap
    (3L, "entirely unrelated training document about spark executors"),
    (4L, "tiny")                                                       // < n words
  ).toDF("doc_id", "text")

  test("overlapStats counts distinct shared shingles per contaminated doc") {
    val out = Decontam.overlapStats(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Int, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1: 10 tokens → 6 5-gram shingles; the 4 inner benchmark
    // shingles of "what … obviously" all appear
    assert(out.contains(1L))
    val (n1, o1, c1) = out(1L)
    assert(n1 == 6 && o1 == 4 && c1 == 0.6667)
    // doc 2 shares no full 5-gram with the benchmark; docs 3/4 nothing
    assert(!out.contains(2L) && !out.contains(3L) && !out.contains(4L))
  }

  test("clean drops flagged docs, keeps clean and too-short docs") {
    val kept = Decontam.clean(train, bench, "doc_id", "text", n = 5)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(2L, 3L, 4L))
  }

  test("contaminatedSpans: only the colliding window is marked, all occurrences, merged") {
    val b = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val t = Seq(
      (1L, "intro words here alpha beta gamma delta epsilon zeta closing"),
      (2L, "clean document with entirely original phrasing and words"),
      // the SAME bench passage twice — both occurrences must mark
      // (no first-occurrence keep here, unlike exactSubstrSpans)
      (3L, "alpha beta gamma delta epsilon pad1 pad2 alpha beta gamma delta epsilon")
    ).toDF("doc_id", "text")
    val out = Decontam.contaminatedSpans(t, b, "doc_id", "text", minTokens = 5)
      .as[(Long, Int, Int, Int)].collect()
    assert(out.toSet == Set((1L, 3, 9, 6), (3L, 0, 5, 5), (3L, 7, 12, 5)))
  }

  test("cleanSpans: contaminated tokens drop, clean train docs pass through") {
    val b = Seq((100L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val t = Seq(
      (1L, "intro words here alpha beta gamma delta epsilon zeta closing"),
      (2L, "clean document with entirely original phrasing and words")
    ).toDF("doc_id", "text")
    val out = Decontam.cleanSpans(t, b, "doc_id", "text", minTokens = 5)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 10, 6, "intro words here closing")))
    assert(out(1) == ((2L, 8, 0, "clean document with entirely original phrasing and words")))
  }

  test("decontamination plan broadcasts the benchmark, never shuffles the corpus scan") {
    val plan = Decontam.overlapStats(train, bench, "doc_id", "text", n = 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"benchmark side must broadcast:\n$plan")
  }

  // ------------------------------------------------------------ bloom

  test("overlapStatsBloom ≡ overlapStats: the bitset prefilter changes the plan, not the relation") {
    val exact = Decontam.overlapStats(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val bloom = Decontam.overlapStatsBloom(train, bench, "doc_id", "text",
        n = 5, mBits = 1 << 10, kProbes = 4)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(bloom == exact)
  }

  test("auto-sized bitset (mBits = 0 default) ≡ exact, floor 2^16 on tiny benches") {
    val exact = Decontam.overlapStats(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    val auto = Decontam.overlapStatsBloom(train, bench, "doc_id", "text", n = 5)
      .as[(Long, Int, Long, Double)].collect().toSet
    assert(auto == exact)
  }

  test("bloom admits no false negatives: probing the benchmark against itself is full contamination") {
    val out = Decontam.overlapStatsBloom(bench, bench, "doc_id", "text",
        n = 5, mBits = 1 << 10, kProbes = 4)
      .select("doc_id", "contamination").as[(Long, Double)].collect().toMap
    assert(out == Map(100L -> 1.0))
  }

  test("benchBloomBits: ≤ mBits/64 words, and the probe path is broadcast joins only") {
    val benchSh = bench.select(explode(
        graft.functions.TextHashes.hashedShingles(col("text"), 5)).as("sh"))
      .distinct()
    val bits = Decontam.benchBloomBits(benchSh, mBits = 1 << 10, kProbes = 4)
    assert(bits.count() <= (1 << 10) / 64)
    val plan = Decontam.overlapStatsBloom(train, bench, "doc_id", "text",
        n = 5, mBits = 1 << 10, kProbes = 4)
      .queryExecution.executedPlan.toString
    // 4 probe joins against the bitset frame, all broadcast — the
    // corpus never shuffles for the bloom test
    assert("BroadcastHashJoin".r.findAllIn(plan).size >= 4,
      s"bitset probes must be broadcast joins:\n$plan")
  }

  // ----------------------------------------------------------- splits

  // ------------------------------------------------ semantic decontam

  // Planted-paraphrase fixture: each doc carries (text, embedding).
  // The exact copy shares both 5-grams AND the embedding with the
  // bench item; the PARAPHRASE shares no 5-gram but sits at cosine
  // ≈ 0.995; the unrelated doc is orthogonal.
  private val semBenchDocs = Seq(
    (100L, "what is the capital of france paris obviously",
      Seq(1.0f, 0.0f, 0.0f, 0.0f)))
  private val semTrainDocs = Seq(
    (1L, "leaked what is the capital of france paris obviously end",
      Seq(1.0f, 0.0f, 0.0f, 0.0f)), // exact copy: n-gram AND semantic hit
    (2L, "which city serves as the french capital why paris of course",
      Seq(0.995f, 0.1f, 0.0f, 0.0f)), // paraphrase: SEMANTIC hit only
    (3L, "entirely unrelated training document about spark executors",
      Seq(0.0f, 0.0f, 1.0f, 0.0f))) // neither

  test("semanticOverlap flags ⊇ n-gram flags on planted paraphrases (identical-embedding premise)") {
    val bench = semBenchDocs.toDF("doc_id", "text", "embedding")
    val train = semTrainDocs.toDF("doc_id", "text", "embedding")
    val ngramFlagged = Decontam.overlapStats(train, bench, "doc_id", "text",
      n = 5).select("doc_id").as[Long].collect().toSet
    val semFlagged = Decontam.semanticOverlap(train, bench, "doc_id",
      "embedding", floor = 0.9).select("doc_id").as[Long].collect().toSet
    // exact text copies carry (at least) the bench embedding itself →
    // cosine 1 ≥ any floor: everything the n-gram pass catches, the
    // semantic pass catches too
    assert(ngramFlagged.subsetOf(semFlagged),
      s"ngram-only flags: ${ngramFlagged -- semFlagged}")
    // and the paraphrase is the strict extra the n-gram pass misses
    assert(!ngramFlagged.contains(2L) && semFlagged.contains(2L),
      s"paraphrase must be semantic-only: ngram=$ngramFlagged sem=$semFlagged")
    assert(!semFlagged.contains(3L), "orthogonal doc must not flag")
    // per-doc stats: exact copy maxes at cosine 1.0 against 1 bench item
    val stats = Decontam.semanticOverlap(train, bench, "doc_id",
        "embedding", floor = 0.9)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(stats(1L) == (1L, 1.0))
    assert(stats(2L)._2 > 0.99 && stats(2L)._2 < 1.0)
  }

  test("semanticClean keeps exactly the unflagged docs; plan broadcasts the bench side") {
    val bench = semBenchDocs.toDF("doc_id", "text", "embedding")
    val train = semTrainDocs.toDF("doc_id", "text", "embedding")
    val kept = Decontam.semanticClean(train, bench, "doc_id", "embedding",
      floor = 0.9).select("doc_id").as[Long].collect().toSet
    assert(kept == Set(3L))
    val plan = Decontam.semanticOverlap(train, bench, "doc_id", "embedding")
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastExchange"),
      s"bench side must broadcast:\n$plan")
  }

  test("assign: stable buckets, exact CASE ranges, weights enforced") {
    val docs = (1L to 1000L).toDF("doc_id")
    val out = Splits.assign(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "s1")
    val rows = out.select("doc_id", "bucket", "split")
      .as[(Long, Int, String)].collect()
    assert(rows.forall { case (_, b, s) =>
      (b >= 0 && b < 100) && s == (if (b < 80) "train" else if (b < 90) "val" else "test")
    })
    // roughly proportional (md5 is uniform; 1000 keys)
    val bySplit = rows.groupBy(_._3).view.mapValues(_.length).toMap
    assert(bySplit("train") > 700 && bySplit("train") < 900)
    assert(bySplit("val") > 50 && bySplit("test") > 50)
    // re-running yields the identical assignment (no rand anywhere)
    val again = Splits.assign(docs, "doc_id",
      Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "s1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(rows.forall { case (id, _, s) => again(id) == s })
  }

  test("assign: appending rows never moves existing assignments") {
    val w = Seq("train" -> 90, "test" -> 10)
    val first = Splits.assign((1L to 100L).toDF("doc_id"), "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val grown = Splits.assign((1L to 200L).toDF("doc_id"), "doc_id", w)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(first.forall { case (id, s) => grown(id) == s })
  }

  test("assign: salt re-rolls; bad weights rejected") {
    val docs = (1L to 200L).toDF("doc_id")
    val a = Splits.assign(docs, "doc_id", Seq("a" -> 50, "b" -> 50), "salt1")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    val b = Splits.assign(docs, "doc_id", Seq("a" -> 50, "b" -> 50), "salt2")
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(a != b, "different salts must re-roll some assignments")
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "doc_id", Seq("a" -> 50, "b" -> 40))
    }
    intercept[IllegalArgumentException] {
      Splits.assign(docs, "doc_id", Seq("a" -> 110, "b" -> -10))
    }
  }

  test("near-dup curation keeps a subset of the exact-dedup curation") {
    // the near-dup keep-set collapses every RAW-identical dup group
    // (identical docs share every band) and possibly more, so the
    // composite's survivors ⊆ the exact composite's on this corpus.
    // (Exact dedup canonicalizes case/whitespace and minhash does not,
    // so a corpus of case-variant dups could break the subset — this
    // corpus's duplicate groups are raw-identical.)
    val sf = "/root/testdata/sf0.001"
    val exact = graft.Queries.all("curate_corpus")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    val near = graft.Queries.all("curate_corpus_near")(spark, sf)
      .select("doc_id").as[Long].collect().toSet
    assert(near.nonEmpty && near.subsetOf(exact),
      s"near-dedup must only remove more: |near|=${near.size} |exact|=${exact.size}")
  }

  test("split_leakage = the cross-split subset of the LSH pair screen") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val leaks = graft.Queries.all("split_leakage")(spark, sf)
      .select($"id_a".as[Long], $"id_b".as[Long],
        $"split_a".as[String], $"split_b".as[String])
      .collect().toSeq
    leaks.foreach { case (a, b, sa, sb) =>
      assert(sa != sb, s"($a,$b) is not cross-split: $sa/$sb")
    }
    // exactly the near-dup pairs whose endpoints drew different splits
    val split = Splits.assign(docs.select("doc_id"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "graft")
      .select($"doc_id".as[Long], $"split".as[String]).collect().toMap
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 200)
      .select($"id_a".as[Long], $"id_b".as[Long]).collect().toSeq
    val expected = pairs.filter { case (a, b) => split(a) != split(b) }
      .map { case (a, b) => (a, b, split(a), split(b)) }.sorted
    assert(leaks.sorted == expected, "leakage audit ≡ pair screen ⋈ splits")
    assert(pairs.nonEmpty, "fixture sanity: the screen finds near-dups at sf0.001")
  }

  test("repairLeakage moves spanning components whole; clean docs untouched") {
    val assigned = Seq(
      1L -> "train", 2L -> "val", 3L -> "val",   // chain 1-2, 2-3 spans
      4L -> "test", 7L -> "test",                // component 4-7 within test
      5L -> "train", 6L -> "val"                 // unpaired
    ).toDF("doc_id", "split")
    val pairs = Seq((1L, 2L), (2L, 3L), (4L, 7L)).toDF("id_a", "id_b")
    val out = Splits.repairLeakage(assigned, pairs)
      .select($"doc_id".as[Long], $"split".as[String],
        $"moved".as[Boolean], $"split_repaired".as[String])
      .collect().map(r => r._1 -> r).toMap
    assert(out.size == 7)
    // the spanning component moves WHOLE: 2 and 3 (val) to train; 1
    // already there — transitive hygiene: a pairwise move of 2 alone
    // would have left the (2,3) pair crossing train/val
    assert(!out(1L)._3 && out(1L)._4 == "train")
    assert(out(2L)._3 && out(2L)._4 == "train")
    assert(out(3L)._3 && out(3L)._4 == "train")
    // single-split component and unpaired docs: untouched
    Seq(4L -> "test", 7L -> "test", 5L -> "train", 6L -> "val").foreach {
      case (id, s) => assert(!out(id)._3 && out(id)._4 == s, s"doc $id")
    }
  }

  test("curate_corpus_mix composes its stages faithfully at sf0.001") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val out = graft.Queries.all("curate_corpus_mix")(spark, sf)
      .select($"doc_id".as[Long], $"source".as[String],
        $"n_tokens".as[Long], $"cum_before".as[Long]).collect()
    val ids = out.map(_._1).toSet
    assert(ids.nonEmpty, "fixture sanity: the funnel selects something")
    // every selected doc passes both corpus-stat gates independently
    val bpKeep = graft.ext.TextOps.boilerplateSignals(docs, minDocFreq = 20)
      .filter($"keep").select($"doc_id".as[Long]).collect().toSet
    val gKeep = docs.filter(graft.ext.TextOps.gopherKeep($"text"))
      .select($"doc_id".as[Long]).collect().toSet
    assert(ids.subsetOf(bpKeep intersect gKeep), "a gated doc slipped through")
    // ...and is its own near-dup cluster representative within the gate
    val gatedIds = (bpKeep intersect gKeep).toSeq.toDF("doc_id")
    val gated = docs.join(gatedIds, Seq("doc_id"), "left_semi")
    val reps = Dedup.minhashClusters(gated, "doc_id", "text")
      .filter($"doc" === $"cluster").select($"doc".as[Long]).collect().toSet
    assert(ids.subsetOf(reps), "a non-canonical near-dup was selected")
    // ...and respects its source's token budget at the fill position
    val budget = (src: String) =>
      if (src == "src0") 2000L else if (src == "src1") 500L else 1000L
    out.foreach { case (id, src, _, cum) =>
      assert(cum < budget(src), s"doc $id of $src filled past the budget")
    }
  }

  test("repairLeakage post-condition: re-auditing the repaired split finds zero leaks") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val repaired = graft.Queries.all("split_repair")(spark, sf)
    assert(repaired.count() == docs.count(), "every doc gets a verdict")
    assert(repaired.filter($"moved").count() > 0,
      "fixture sanity: sf0.001 has cross-split near-dups to repair")
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 200)
    val sp = repaired.select($"doc_id", $"split_repaired")
    val residual = pairs
      .join(sp.toDF("id_a", "split_a"), "id_a")
      .join(sp.toDF("id_b", "split_b"), "id_b")
      .filter($"split_a" =!= $"split_b")
      .count()
    assert(residual == 0L, s"$residual cross-split pairs survived repair")
  }
}
