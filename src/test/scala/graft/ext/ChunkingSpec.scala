package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def doc(id: Long, nTokens: Int) =
    (id, (1 to nTokens).map(i => s"w$i").mkString(" "))

  test("chunk law: starts step by size−overlap, windows cap at size") {
    // 50 tokens, chunks of 20 overlapping 5 → starts 1, 16, 31 (the
    // start-46 window is 46..50 = 5 tokens, all inside 31..50: subsumed)
    val out = Chunking.chunkByTokens(
        Seq(doc(1L, 50)).toDF("doc_id", "text"), "doc_id", "text", 20, 5)
      .orderBy("chunk_idx")
      .select("chunk_idx", "chunk_start", "n_chunk_tokens")
      .as[(Int, Int, Int)].collect().toSeq
    assert(out == Seq((0, 1, 20), (1, 16, 20), (2, 31, 20)))
  }

  test("every token is covered and consecutive chunks share `overlap` tokens") {
    val out = Chunking.chunkByTokens(
        Seq(doc(1L, 83)).toDF("doc_id", "text"), "doc_id", "text", 32, 8)
      .orderBy("chunk_idx")
      .select("chunk_start", "n_chunk_tokens", "chunk_text")
      .as[(Int, Int, String)].collect().toSeq
    val spans = out.map { case (st, n, _) => (st, st + n - 1) }
    assert(spans.head._1 == 1 && spans.last._2 == 83)
    spans.sliding(2).foreach { case Seq((_, aEnd), (bSt, _)) =>
      assert(bSt <= aEnd + 1, "gap between consecutive chunks")
    }
    // chunk text really is the token slice
    out.foreach { case (st, n, text) =>
      assert(text == (st until st + n).map(i => s"w$i").mkString(" "))
    }
  }

  test("subsumed tails are dropped; short docs yield exactly one chunk") {
    // 26 tokens, size 20 overlap 5: start 16 covers 16..26 (11 new) — kept;
    // 22 tokens: start 16 covers 16..22, 7 > overlap 5 — kept;
    // 20 tokens: start 16 covers 16..20, 5 tokens ≤ overlap — SUBSUMED
    val out = Chunking.chunkByTokens(
        Seq(doc(1L, 26), doc(2L, 22), doc(3L, 20), doc(4L, 3))
          .toDF("doc_id", "text"), "doc_id", "text", 20, 5)
      .groupBy("doc_id").agg(count(lit(1)).as("n"))
      .as[(Long, Long)].collect().toMap
    assert(out == Map(1L -> 2L, 2L -> 2L, 3L -> 1L, 4L -> 1L))
  }

  test("zero shuffle: the chunk plan has no exchange") {
    val plan = Chunking.chunkByTokens(
        Seq(doc(1L, 40)).toDF("doc_id", "text"), "doc_id", "text", 32, 8)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"chunking must not shuffle:\n$plan")
  }
}
