package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class PackingAndRedactSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- packing

  test("packByBudget starts a new pack at each budget crossing, never splits a doc") {
    // per-doc token counts: 300, 300, 300, 100, 500 (source A)
    val docs = Seq(
      (1L, "A", 300), (2L, "A", 300), (3L, "A", 300), (4L, "A", 100), (5L, "A", 500),
      (6L, "B", 600)
    ).toDF("doc_id", "source", "n")
    val packed = Packing.packByBudget(docs, Seq("source"), Seq("doc_id"),
        col("n"), budget = 512)
      .select("doc_id", "pack_id").as[(Long, Long)].collect().toMap
    // preceding totals A: 0, 300, 600, 900, 1000 → packs 0, 0, 1, 1, 1
    assert(packed(1L) == 0 && packed(2L) == 0)
    assert(packed(3L) == 1 && packed(4L) == 1)
    // doc 5 starts at 1000 → floor(1000/512) = 1 (overflows pack 1;
    // by-construction overflow is ≤ one document)
    assert(packed(5L) == 1)
    assert(packed(6L) == 0, "groups pack independently")
  }

  test("packStats reports per-pack doc counts and token fill") {
    val docs = Seq((1L, "A", 300), (2L, "A", 300), (3L, "A", 300))
      .toDF("doc_id", "source", "n")
    val stats = Packing.packStats(
        Packing.packByBudget(docs, Seq("source"), Seq("doc_id"), col("n"), 512),
        Seq("source"))
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(stats(("A", 0L)) == (2L, 600L))
    assert(stats(("A", 1L)) == (1L, 300L))
  }

  test("packByBudget uses a ROWS frame: tied order keys still step the cumsum per doc") {
    // A(1,300) B(2,300) C(2,300): with Spark's default RANGE frame the
    // tied keys 2 would share cum=900 and BOTH land in pack 1; the ROWS
    // frame steps per row, so exactly one of B/C closes pack 0
    val docs = Seq((1L, "A", 300), (2L, "A", 300), (2L, "A", 300))
      .toDF("doc_id", "source", "n")
    val packs = Packing.packByBudget(docs, Seq("source"), Seq("doc_id"),
        col("n"), budget = 512)
      .select("pack_id").as[Long].collect().sorted.toSeq
    assert(packs == Seq(0L, 0L, 1L))
  }

  test("packByBudget guards: global packing and zero budget are rejected") {
    val docs = Seq((1L, "A", 10)).toDF("doc_id", "source", "n")
    intercept[IllegalArgumentException] {
      Packing.packByBudget(docs, Nil, Seq("doc_id"), col("n"), 512)
    }
    intercept[IllegalArgumentException] {
      Packing.packByBudget(docs, Seq("source"), Seq("doc_id"), col("n"), 0)
    }
  }

  test("packTexts assembles members in order regardless of input partitioning") {
    val docs = Seq(
      (2L, "A", "second", 300), (1L, "A", "first", 300), (3L, "A", "third", 300)
    ).toDF("doc_id", "source", "text", "n").repartition(5)
    val packed = Packing.packByBudget(docs, Seq("source"), Seq("doc_id"),
      col("n"), budget = 500)
    val out = Packing.packTexts(packed, Seq("source"), "doc_id", "text", sep = " | ")
      .select("source", "pack_id", "pack_text", "n_docs")
      .as[(String, Long, String, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // preceding totals 0, 300, 600 → packs 0, 0, 1 (budget 500)
    assert(out(("A", 0L)) == ("first | second", 2L))
    assert(out(("A", 1L)) == ("third", 1L))
  }

  test("vocabTopK: counts and (count, token) ordering") {
    val docs = Seq(
      (1L, "apple banana apple Cherry"),
      (2L, "banana apple date")
    ).toDF("doc_id", "text")
    val out = TextOps.vocabTopK(docs, "text", k = 3)
      .as[(String, Long)].collect().toSeq
    assert(out == Seq(("apple", 3L), ("banana", 2L), ("cherry", 1L)),
      "lowercased, count-desc with token tiebreak (cherry < date)")
  }

  // --------------------------------------------------------- redaction

  test("redactPii scrubs emails, IPs, and long digit runs; piiCount matches") {
    val rows = Seq(
      (1L, "contact alice.smith+x@example.org or call 5551234567 via 10.0.0.1 now"),
      (2L, "x1234567@example.com then 1.2.3.4"), // email digits must not double-count
      (3L, "clean text with the number 42 and ip-free prose")
    ).toDF("doc_id", "text")
    val out = rows.select(col("doc_id"),
        TextOps.redactPii(col("text")).as("t"),
        TextOps.piiCount(col("text")).cast("int").as("n"))
      .as[(Long, String, Int)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(out(1L)._1 == "contact <EMAIL> or call <NUM> via <IP> now")
    assert(out(1L)._2 == 3)
    assert(out(2L)._1 == "<EMAIL> then <IP>")
    assert(out(2L)._2 == 2, "digits inside the redacted email must not recount")
    assert(out(3L)._1 == "clean text with the number 42 and ip-free prose")
    assert(out(3L)._2 == 0)
  }

  test("lengthBuckets: exact power-of-2 buckets, no float seam at exact powers") {
    // 1024 tokens must land in the 1024 bucket — the libm-log2 seam
    // this operator exists to avoid — and 1025 in 2048; shorts floor
    // at minBucket; Σ n_tokens is conserved
    val docs = Seq(
      (1L, 1024L), (2L, 1025L), (3L, 1023L),
      (4L, 3L), (5L, 0L), (6L, 16L), (7L, 17L), (8L, 100L)
    ).toDF("doc_id", "n")
    val out = graft.ext.Packing.lengthBuckets(docs, col("n"), minBucket = 16)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
          r.getDouble(5)))).toMap
    assert(out.keySet == Set(16L, 32L, 128L, 1024L, 2048L), s"got $out")
    assert(out(1024L)._1 == 2L && out(1024L)._2 == 1024L + 1023L,
      s"1024 and 1023 share the 1024 bucket: ${out(1024L)}")
    assert(out(2048L) == ((1L, 1025L, 2048L, 1023L,
      math.round(1025L * 10000.0 / 2048L) / 1e4)), s"${out(2048L)}")
    assert(out(16L)._1 == 3L && out(16L)._2 == 19L,
      s"0, 3 and 16 floor at minBucket: ${out(16L)}")
    assert(out(32L) == ((1L, 17L, 32L, 15L, 0.5313)), s"${out(32L)}")
    assert(out.values.map(_._2).sum == docs.agg(sum("n")).head.getLong(0),
      "token mass must be conserved across buckets")
    assert(out.values.forall(v => v._3 == v._2 + v._4),
      "capacity = n_tokens + padding_waste, exactly")
  }
}
