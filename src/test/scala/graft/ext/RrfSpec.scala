package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for reciprocal-rank fusion and the lexical
  * more-like-this leg: exact integer contributions, missing-from-one-
  * list docs, the consensus-beats-single-champion property RRF is
  * used for, and jaccardTopK's exact-duplicate / zero-overlap edges.
  */
class RrfSpec extends SparkSpec {
  import spark.implicits._

  private def rankFrame(rows: Seq[(Long, Long, Int)]) =
    rows.toDF("query_id", "doc_id", "rank")

  test("contributions are exact scaled integers, summed across lists") {
    // doc 10 rank 1 in both lists: 2·round(1e6/61) = 2·16393 = 32786
    // doc 11 rank 2 lex only:        round(1e6/62) = 16129
    val lex = rankFrame(Seq((0L, 10L, 1), (0L, 11L, 2)))
    val sem = rankFrame(Seq((0L, 10L, 1)))
    val out = Similarity.rrfFuse(Seq(lex, sem))
      .select("doc_id", "n_lists", "fused_rank", "rrf_score")
      .as[(Long, Long, Int, Double)].collect().toSet
    assert(out == Set((10L, 2L, 1, 0.032786), (11L, 1L, 2, 0.016129)))
  }

  test("consensus beats a single champion: 2×rank-3 outranks 1×rank-1") {
    // 2·round(1e6/63) = 2·15873 = 31746 > round(1e6/61) = 16393
    val lex = rankFrame(Seq((0L, 20L, 1), (0L, 21L, 3)))
    val sem = rankFrame(Seq((0L, 21L, 3), (0L, 22L, 1)))
    val top = Similarity.rrfFuse(Seq(lex, sem))
      .filter(col("fused_rank") === 1)
      .select("doc_id").as[Long].head()
    assert(top == 21L)
  }

  test("equal-score ties break by doc id; topN truncates per query") {
    val lex = rankFrame(Seq((0L, 5L, 1), (0L, 3L, 1), (1L, 9L, 1)))
    val out = Similarity.rrfFuse(Seq(lex), topN = 1)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 3L), (1L, 9L)))
  }

  test("jaccardTopK: exact duplicate ranks first at jaccard 1.0; zero-overlap docs unranked") {
    val docs = Seq(
      (0L, "alpha beta gamma delta epsilon"),
      (1L, "alpha beta gamma delta epsilon"), // exact dup of the query
      (2L, "alpha beta gamma zeta eta"),      // partial overlap
      (3L, "totally different words here now") // zero shared 3-grams
    ).toDF("doc_id", "text")
    val out = TextOps.jaccardTopK(docs, docs.filter(col("doc_id") === 0),
        n = 3, k = 10)
      .select("doc_id", "jaccard", "rank")
      .as[(Long, Double, Int)].collect().sortBy(_._3)
    assert(out.map(_._1).toSeq == Seq(1L, 2L))
    assert(out.head._2 == 1.0)
    // partial: shingles q={ab g, b g d, g d e}, doc2={ab g, b g z, g z e}
    // → inter 1, union 5 → 0.2
    assert(out(1)._2 == 0.2)
  }

  test("jaccardTopK never pairs a query with itself") {
    val docs = Seq((0L, "a b c d e"), (1L, "a b c d e")).toDF("doc_id", "text")
    val out = TextOps.jaccardTopK(docs, docs, n = 3, k = 10)
      .select("query_id", "doc_id").as[(Long, Long)].collect().toSet
    assert(out == Set((0L, 1L), (1L, 0L)))
  }
}
