package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the cat sat on the mat today"),
    (2L, "the cat sat on the mat today"),           // exact dup of 1
    (3L, "the cat sat on the mat yesterday"),        // near dup of 1
    (4L, "entirely unrelated text about spark jobs"),
    (5L, "THE CAT  SAT ON THE MAT TODAY")            // case/space variant of 1
  ).toDF("doc_id", "text")

  test("exactGroups: canonical-form hash groups case/whitespace variants") {
    val out = Dedup.exactGroups(docs, "doc_id", "text")
      .as[(String, Long, Long)].collect()
    val byKeep = out.map(r => r._2 -> r._3).toMap
    assert(byKeep(1L) == 3L) // 1, 2, and 5 share the canonical hash
    assert(byKeep(3L) == 1L && byKeep(4L) == 1L)
  }

  test("shingles: distinct word n-grams; short docs yield empty array") {
    val out = Seq("a b c d", "a b").toDF("text")
      .select(Dedup.shingles(col("text"), 3)).as[Seq[String]].collect()
    assert(out(0).toSet == Set("a b c", "b c d"))
    assert(out(1).isEmpty)
  }

  test("ngramJaccardPairs: exact Jaccard on shared-shingle candidates") {
    val out = Dedup.ngramJaccardPairs(docs, "doc_id", "text", n = 3, threshold = 0.3)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 1.0) // identical docs
    // (1,3): shingles differ only in grams touching the last word.
    // 5 trigrams each, 4 shared → J = 4/6 = 0.6667
    assert(pairs((1L, 3L)) == 0.6667)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("ngramJaccardPairs: maxDocFreq drops corpus-wide shingles before the join") {
    // every doc shares the boilerplate prefix; only 1/2 share a real tail
    val corpus = Seq(
      (1L, "terms of service apply here widget alpha beta gamma"),
      (2L, "terms of service apply here widget alpha beta gamma"),
      (3L, "terms of service apply here unrelated content entirely"),
      (4L, "terms of service apply here something else altogether now")
    ).toDF("doc_id", "text")
    // cap=3: the prefix shingles appear in 4 docs and are dropped, so
    // (1,2) still matches on the tail shingles but 3/4 pair with nobody
    val capped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 3)
      .as[(Long, Long, Double)].collect()
    assert(capped.map(r => (r._1, r._2)).toSet == Set((1L, 2L)))
    assert(capped.head._3 == 1.0) // retained sets are identical
    // without the cap the boilerplate makes everything look similar
    val uncapped = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
        n = 3, threshold = 0.3, maxDocFreq = Int.MaxValue)
      .as[(Long, Long, Double)].collect()
    assert(uncapped.length > 1)
  }

  test("minhashLshPairs: identical and near-dup docs surface, unrelated do not") {
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L))) // 0.67-similar: some band collides w.h.p.
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("minhashLshPairs: maxBucket skips giant band buckets, default keeps all") {
    // 4 identical docs: every band bucket has 4 members
    val clones = (1L to 4L).map(i => (i, "the same text repeated in every document"))
      .toDF("doc_id", "text")
    val all = Dedup.minhashLshPairs(clones, "doc_id", "text").count()
    assert(all == 6, "C(4,2) pairs by default")
    val capped = Dedup.minhashLshPairs(clones, "doc_id", "text", maxBucket = 3).count()
    assert(capped == 0, "buckets deeper than maxBucket are skipped")
    // a cap above the group size changes nothing
    assert(Dedup.minhashLshPairs(clones, "doc_id", "text", maxBucket = 10).count() == 6)
  }

  test("editDistancePairs: canonical-prefix blocking + bounded Levenshtein verify") {
    val out = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 10)
      .as[(Long, Long, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // 1/2/5 share canonical text exactly → dist 0
    assert(out((1L, 2L)) == 0 && out((1L, 5L)) == 0 && out((2L, 5L)) == 0)
    // "today" vs "yesterday": same 16-byte prefix, lev("today","yesterday")=5
    assert(out((1L, 3L)) == 5)
    // doc 4 shares no prefix with anything
    assert(!out.keySet.exists { case (a, b) => a == 4L || b == 4L })
    // tighter bound drops the near pair but keeps exact dups
    val tight = Dedup.editDistancePairs(docs, "doc_id", "text", maxDist = 2)
      .as[(Long, Long, Int)].collect().map(r => (r._1, r._2)).toSet
    assert(tight == Set((1L, 2L), (1L, 5L), (2L, 5L)))
  }

  test("lshBandKeys: banded frame is (doc, band_idx, band_hash) only — no arrays") {
    // the band-key shuffle is the heaviest in LSH; it must never carry
    // the shingle array (r3 did: ~bands× extra shuffle volume)
    val sh = docs.select(col("doc_id").as("doc"),
      graft.functions.TextHashes.hashedShingles(col("text"), 3).as("s"))
    val banded = Dedup.lshBandKeys(sh, k = 64, bands = 16)
    assert(banded.schema.fieldNames.toSeq == Seq("doc", "band_idx", "band_hash"))
    assert(banded.schema.fields.forall(!_.dataType.typeName.contains("array")),
      s"banded frame must be fixed-width only: ${banded.schema}")
    assert(banded.count() == docs.count() * 16)
  }

  test("minhashClusters: dup groups collapse to min-id cluster, linear output") {
    val out = Dedup.minhashClusters(docs, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out.size == 5) // one row per doc — never pairs
    assert(out(1L) == 1L && out(2L) == 1L) // identical docs share cluster 1
    assert(out(3L) == 1L) // near-dup chains into the same cluster
    assert(out(4L) == 4L) // unrelated doc is its own representative
    assert(out(5L) == 5L) // minhash is raw-text: case variant isn't an LSH dup
  }

  test("minhashClusters: docs shorter than n words survive as singleton clusters") {
    val withShort = docs.unionByName(Seq(
      (6L, "hi"), (7L, "ok then")).toDF("doc_id", "text"))
    val out = Dedup.minhashClusters(withShort, "doc_id", "text")
      .as[(Long, Long)].collect().toMap
    assert(out.size == 7, "one row per input doc, short docs included")
    assert(out(6L) == 6L && out(7L) == 7L)
    assert(out(1L) == 1L && out(2L) == 1L) // long-doc clustering unchanged
  }

  test("minhashClusters: early-stop at label fixpoint returns the converged labels") {
    // exact dups converge in one round; extra iters must be no-ops
    val a = Dedup.minhashClusters(docs, "doc_id", "text", iters = 1)
      .as[(Long, Long)].collect().toMap
    val b = Dedup.minhashClusters(docs, "doc_id", "text", iters = 10)
      .as[(Long, Long)].collect().toMap
    assert(a == b)
  }

  test("simhashPairs: output is invariant in the banding scheme (pigeonhole recall 1.0)") {
    // brute-force truth: every pair at Hamming ≤ 3
    import graft.functions.TextHashes
    val hashed = docs.select(col("doc_id"), TextHashes.simhash(col("text")).as("sh"))
    val truth = hashed.as("a").join(hashed.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("id_a"), col("b.doc_id").as("id_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).as("hamming"))
      .filter(col("hamming") <= 3)
      .as[(Long, Long, Int)].collect().toSet
    for (pieces <- Seq(4, 5, 6, 8)) {
      val got = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3, pieces = pieces)
        .as[(Long, Long, Int)].collect().toSet
      assert(got == truth, s"pieces=$pieces must equal the brute-force pair set")
    }
  }

  test("simhashPairs: identical docs at Hamming 0; unrelated docs absent") {
    val out = Dedup.simhashPairs(docs, "doc_id", "text", maxHamming = 3)
      .as[(Long, Long, Int)].collect()
    val pairs = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 0)
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
  }

  test("winnowingContainmentPairs: containment is high for prefix-copy, zero for unrelated") {
    val base = "the quick brown fox jumps over the lazy dog again and again " * 4
    val corpus = Seq(
      (1L, base),
      (2L, base + " plus an appended epilogue that extends the document"),
      (3L, "completely different material with no shared phrases at all whatsoever")
    ).toDF("doc_id", "text")
    val out = Dedup.winnowingContainmentPairs(corpus, "doc_id", "text", threshold = 0.5)
      .as[(Long, Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2) -> r._4).toMap
    assert(pairs.keySet == Set((1L, 2L)))
    assert(pairs((1L, 2L)) > 0.9, s"prefix copy containment: ${pairs((1L, 2L))}")
  }

  test("embeddingCosinePairs: blocked candidates verified by exact cosine") {
    val vecs = Seq(
      (1L, "A", Array(1.0f, 0.0f)),
      (2L, "A", Array(1.0f, 0.1f)),   // cosine ≈ 0.995 with 1
      (3L, "A", Array(0.0f, 1.0f)),   // orthogonal to 1
      (4L, "B", Array(1.0f, 0.0f))    // identical to 1 but different block
    ).toDF("vec_id", "label", "embedding")
    val out = Dedup.embeddingCosinePairs(vecs, "vec_id", "embedding", "label", 0.9)
      .as[(Long, Long, Double)].collect()
    assert(out.map(r => (r._1, r._2)).toSet == Set((1L, 2L))) // 4 blocked away, 3 below threshold
    assert(out.head._3 > 0.99)
  }

  test("newAgainstReference keeps only canonically-unseen incoming docs") {
    val reference = Seq(
      (10L, "the cat sat on the mat today"),
      (11L, "reference only material")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      (1L, "THE CAT  SAT ON THE MAT TODAY"), // canonical dup of ref 10
      (2L, "a genuinely new document"),
      (3L, "reference only material")        // exact dup of ref 11
    ).toDF("doc_id", "text")
    val kept = Dedup.newAgainstReference(incoming, reference, "doc_id", "text")
    assert(kept.select("doc_id").as[Long].collect().toSet == Set(2L))
    assert(kept.columns.toSeq == Seq("doc_id", "text"), "helper column dropped")
  }

  test("repetitionSignals: repeated n-grams raise the ratio; short docs excluded") {
    val docs = Seq(
      (1L, "x y x y x y x y"),                       // 6 trigrams, 2 distinct
      (2L, "all words completely different here now"), // no repeats
      (3L, "one two")                                  // < 3 words
    ).toDF("doc_id", "text")
    val out = TextOps.repetitionSignals(docs)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (6L, 2L, 0.6667))
    assert(out(2L) == (4L, 4L, 0.0))
    assert(!out.contains(3L))
  }

  test("canonicalPerCluster keeps the preferred member, id tiebreak") {
    val labels = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L))
      .toDF("node", "label")
    val attrs = Seq((1L, 5L), (2L, 9L), (3L, 9L), (10L, 4L), (11L, 2L))
      .toDF("doc_id", "n_chars")
    val out = Dedup.canonicalPerCluster(labels, attrs, "doc_id", Seq("n_chars"))
      .select("cluster", "canonical_doc_id", "n_chars")
      .as[(Long, Long, Long)].collect().toSet
    // cluster 1: 2 and 3 tie at 9 chars → lower id 2 wins; cluster 10: 10
    assert(out == Set((1L, 2L, 9L), (10L, 10L, 4L)))
  }

  test("distinct vs approx distinct per group") {
    val ev = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 1)).toDF("g", "u")
    val exact = Dedup.distinctPerGroup(ev, "g", "u").as[(String, Long)].collect().toMap
    assert(exact == Map("a" -> 2L, "b" -> 1L))
    val approx = Dedup.approxDistinctPerGroup(ev, "g", "u").as[(String, Long)].collect().toMap
    assert(approx("a") == 2L && approx("b") == 1L) // HLL exact at tiny cardinality
  }

  test("newAgainstReferenceNear: re-crawls die, fresh and within-batch kept") {
    val reference = Seq(
      (0L, "the quick brown fox jumps over the lazy dog today")
    ).toDF("doc_id", "text")
    val incoming = Seq(
      // reflowed whitespace: exact-fingerprint would also catch this
      (1L, "the  quick brown fox jumps over the lazy  dog today"),
      // appended word: jaccard 8/9 — the case the exact form misses
      (3L, "the quick brown fox jumps over the lazy dog today extra"),
      // genuinely new
      (5L, "completely different content with no shared trigrams at all"),
      // within-batch duplicate of 5: NOT collapsed (corpus screen only)
      (7L, "completely different content with no shared trigrams at all")
    ).toDF("doc_id", "text")
    val kept = Dedup.newAgainstReferenceNear(incoming, reference,
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(5L, 7L))
    // the near screen can only drop MORE than the exact screen
    val keptExact = Dedup.newAgainstReference(incoming, reference,
        "doc_id", "text")
      .select("doc_id").as[Long].collect().toSet
    assert(kept.subsetOf(keptExact))
  }

  test("spanDedupByTokens: global (doc, pos)-first occurrence wins, order kept") {
    val docs = Seq(
      // doc 1: spans "a b", "c d", "a b" — the within-doc repeat drops
      (1L, "a b c d a b"),
      // doc 2 repeats doc 1's first span, then contributes its own
      (2L, "a b x y"),
      // doc 3 is entirely doc 2's second span
      (3L, "x y"),
      // doc 4: no tokens at all
      (4L, "   ")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedupByTokens(docs, "doc_id", "text", spanTokens = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(out(1L) == (3L, 2L, "a b c d"))
    assert(out(2L) == (2L, 1L, "x y"))
    assert(out(3L) == (1L, 0L, ""))
    assert(out(4L) == (0L, 0L, ""))
  }

  test("spanDedupByTokens: short tail span is its own unit") {
    val docs = Seq((1L, "a b c"), (2L, "c")).toDF("doc_id", "text")
    val out = Dedup.spanDedupByTokens(docs, "doc_id", "text", spanTokens = 2)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // doc 1's tail span "c" claims first occurrence; doc 2's sole span dies
    assert(out(1L) == (2L, 2L, "a b c"))
    assert(out(2L) == (1L, 0L, ""))
  }

  test("spanDedupByLines: duplicated + blank lines drop, newlines rejoin") {
    val docs = Seq(
      (1L, "menu\n\ncontent one\nmenu"),
      (2L, "menu\ncontent two")
    ).toDF("doc_id", "text")
    val out = Dedup.spanDedupByLines(docs, "doc_id", "text")
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // blank line is dropped at span extraction, not counted in n_spans
    assert(out(1L) == (3L, 2L, "menu\ncontent one"))
    assert(out(2L) == (2L, 1L, "content two"))
  }

  test("spanDedup is deterministic under repartitioning") {
    val docs = (0L until 60L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7} w${i % 5}"))
      .toDF("doc_id", "text")
    val a = Dedup.spanDedupByTokens(docs, "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    val b = Dedup.spanDedupByTokens(docs.repartition(13), "doc_id", "text", 2)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(a.sameElements(b))
  }

  test("exactSubstrSpans: copied passage at DIFFERENT offsets is caught and merged") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "intro words here alpha beta gamma delta epsilon zeta closing")
    ).toDF("doc_id", "text")
    // 6-token passage sits at offset 0 in doc 1 and offset 3 in doc 2:
    // its two sliding 5-grams are first in doc 1, so doc 2 gets the
    // marked windows [3,8) ∪ [4,9) merged to one region [3,9)
    val out = Dedup.exactSubstrSpans(corpus, "doc_id", "text", minTokens = 5)
      .as[(Long, Int, Int, Int)].collect()
    assert(out.toSet == Set((2L, 3, 9, 6)))
    // ...which the chunk-ALIGNED span dedup structurally misses: no
    // fixed non-overlapping 5-token window is shared at these offsets
    val aligned = Dedup.spanDedupByTokens(corpus, "doc_id", "text", 5)
      .as[(Long, Long, Long, String)].collect()
    assert(aligned.forall(r => r._2 == r._3), "chunked windows all kept")
  }

  test("exactSubstrSpans: intra-doc repeat marks the second occurrence only") {
    val corpus = Seq(
      (3L, "x y z w v junk1 junk2 x y z w v")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrSpans(corpus, "doc_id", "text", minTokens = 5)
      .as[(Long, Int, Int, Int)].collect()
    assert(out.toSet == Set((3L, 7, 12, 5)))
  }

  test("exactSubstrSpans: separated duplicated regions stay separate rows") {
    val corpus = Seq(
      (4L, "one two three four five filler6 filler7 filler8 six seven eight nine ten"),
      (5L, "one two three four five other stuff entirely six seven eight nine ten"),
      (6L, "short doc here")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrSpans(corpus, "doc_id", "text", minTokens = 5)
      .as[(Long, Int, Int, Int)].collect()
    // doc 4 is the (doc, pos)-first for both shared 5-grams; doc 5's
    // two marked windows have an unmarked gap [5,8) between them, and
    // the <5-token doc 6 has no grams at all
    assert(out.toSet == Set((5L, 0, 5, 5), (5L, 8, 13, 5)))
  }

  test("exactSubstrApply: covered tokens drop, span-free docs pass through") {
    val corpus = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta"),
      (2L, "intro words here alpha beta gamma delta epsilon zeta closing"),
      (3L, "tiny doc")
    ).toDF("doc_id", "text")
    val out = Dedup.exactSubstrApply(corpus, "doc_id", "text", minTokens = 5)
      .as[(Long, Int, Int, String)].collect().sortBy(_._1)
    // doc 1 is the first occurrence — untouched; doc 2 loses [3,9)
    assert(out(0) == ((1L, 8, 0, "alpha beta gamma delta epsilon zeta eta theta")))
    assert(out(1) == ((2L, 10, 6, "intro words here closing")))
    assert(out(2) == ((3L, 2, 0, "tiny doc")))
  }

  test("exactSubstrSpans is deterministic under repartitioning") {
    val corpus = (0L until 60L)
      .map(i => (i, s"w${i % 7} w${i % 5} w${i % 3} w${i % 7} w${i % 5} w${i % 11} t$i"))
      .toDF("doc_id", "text")
    val a = Dedup.exactSubstrSpans(corpus, "doc_id", "text", 3)
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    val b = Dedup.exactSubstrSpans(corpus.repartition(13), "doc_id", "text", 3)
      .as[(Long, Int, Int, Int)].collect().sortBy(r => (r._1, r._2))
    assert(a.sameElements(b))
  }

  test("threshold sweep: buckets partition the candidates, cumulative ties to the 0.5 screen") {
    val sf = "/root/testdata/sf0.001"
    val docs = graft.Tables.documents(spark, sf)
    val sweep = graft.Queries.all("dedup_threshold_sweep")(spark, sf)
      .select($"bucket".as[Long], $"n_pairs".as[Long],
        $"n_at_or_above".as[Long]).collect().sortBy(-_._1)
    assert(sweep.nonEmpty)
    // cumulative = running sum from the top bucket down
    var cum = 0L
    sweep.foreach { case (_, n, atOrAbove) =>
      cum += n
      assert(atOrAbove == cum, "cumulative count broken")
    }
    // pairs at buckets >= 5 ARE the production screen's pairs (its
    // verify floor is 0.5, and bucket = round(j*1e4) div 1000)
    val production = Dedup.minhashLshPairs(docs, "doc_id", "text",
      maxBucket = 200).count()
    val atHalf = sweep.filter(_._1 >= 5L).map(_._2).sum
    assert(atHalf == production,
      s"sweep says $atHalf pairs at >= 0.5, screen finds $production")
  }

  test("near-dup state compaction: both tables shrink to one file per bucket, identical screen, later folds append") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_near_compact").toString + "/state"
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog tonight"),
      (2L, "completely different content about distributed query engines"),
      (3L, "a third unrelated document mentioning suffix automata theory"),
      (4L, "the quick brown fox jumps over the lazy dog at dawn"))
    docs.zipWithIndex.foreach { case ((id, t), b) =>
      Dedup.updateSavedNearDupState(root, Seq((id, t)).toDF("doc_id", "text"),
        "doc_id", "text", batchId = b.toLong, buckets = 2)
    }
    val probeBatch = Seq(
      (10L, "the quick brown fox jumps over the lazy dog tonight"),
      (11L, "entirely novel text that matches nothing in the state"))
      .toDF("doc_id", "text")
    def screen() = Dedup.newAgainstIndex(probeBatch,
        Dedup.savedNearDupIndex(spark, root, batchId = 99L, buckets = 2),
        "doc_id", "text")
      .select($"doc_id".as[Long]).collect().toSet
    def dataFiles(sub: String): Int = new java.io.File(root + "/" + sub)
      .listFiles().count(_.getName.startsWith("part-"))
    val before = screen()
    val (bBands, bSh) = (dataFiles("bands"), dataFiles("sh"))
    Dedup.compactSavedNearDupState(spark, root, buckets = 2)
    assert(dataFiles("bands") < bBands && dataFiles("bands") <= 2,
      s"bands files: $bBands -> ${dataFiles("bands")}")
    assert(dataFiles("sh") < bSh && dataFiles("sh") <= 2,
      s"shingle files: $bSh -> ${dataFiles("sh")}")
    assert(screen() == before, "screen identical after compaction")
    // later folds still append through both re-pinned markers
    Dedup.updateSavedNearDupState(root,
      Seq((20L, "yet another genuinely fresh document body")).toDF("doc_id", "text"),
      "doc_id", "text", batchId = 50L, buckets = 2)
    assert(Dedup.savedNearDupShingles(spark, root, 2)
      .filter(col("g") === 20L).count() == 1L)
  }
}
