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

  test("minhashLshPairs: identical and near-dup docs surface, unrelated do not") {
    val out = Dedup.minhashLshPairs(docs, "doc_id", "text", n = 3)
      .as[(Long, Long, Double)].collect()
    val pairs = out.map(r => (r._1, r._2) -> r._3).toMap
    assert(pairs((1L, 2L)) == 1.0)
    assert(pairs.contains((1L, 3L))) // 0.67-similar: some band collides w.h.p.
    assert(!pairs.keySet.exists { case (a, b) => a == 4L || b == 4L })
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

  test("distinct vs approx distinct per group") {
    val ev = Seq(("a", 1), ("a", 2), ("a", 2), ("b", 1)).toDF("g", "u")
    val exact = Dedup.distinctPerGroup(ev, "g", "u").as[(String, Long)].collect().toMap
    assert(exact == Map("a" -> 2L, "b" -> 1L))
    val approx = Dedup.approxDistinctPerGroup(ev, "g", "u").as[(String, Long)].collect().toMap
    assert(approx("a") == 2L && approx("b") == 1L) // HLL exact at tiny cardinality
  }
}
