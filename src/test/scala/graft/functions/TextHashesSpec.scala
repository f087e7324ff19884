package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "single"),
    (3L, "a  double  spaced  text"), // empty tokens from double spaces
    (4L, "trailing space "),
    (5L, ""),
    (6L, "the quick brown fox jumps over the lazy dog")
  ).toDF("id", "text")

  test("hashedShingles = xxhash64 of the string shingles (set equality)") {
    val n = 3
    val viaStrings = docs.select(col("id"),
      transform(Dedup.shingles(col("text"), n), s => xxhash64(s)).as("h"))
    val native = docs.select(col("id"),
      TextHashes.hashedShingles(col("text"), n).as("h"))
    val a = viaStrings.as[(Long, Seq[Long])].collect().toMap
    val b = native.as[(Long, Seq[Long])].collect().toMap
    a.foreach { case (id, hs) =>
      assert(hs.toSet == b(id).toSet, s"doc $id shingle hash sets differ")
    }
    // note: Dedup.shingles on "a  double  spaced  text" — Spark split
    // keeps empty tokens, so both sides see the same 7-token stream
  }

  test("native simhash is bit-identical to the column-algebra formulation") {
    val algebraic = docs.select(col("id"),
      Dedup.simhash64(split(col("text"), " ")).as("sh"))
      .as[(Long, Long)].collect().toMap
    val native = docs.select(col("id"),
      TextHashes.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    algebraic.foreach { case (id, sh) =>
      assert(native(id) == sh, s"doc $id simhash differs")
    }
  }

  test("minhashSig: per-slot minimum of XXH64(element, slot)") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    val elems = Seq(42L, -7L, 123456789L)
    val k = 8
    val expected = (0 until k).map { j =>
      elems.map(e => XXH64.hashLong(e, j)).min
    }
    val got = Seq(elems).toDF("s")
      .select(TextHashes.minhashSig(col("s"), k)).as[Seq[Long]].head()
    assert(got == expected)
  }

  test("minhash signatures: identical docs agree, distinct docs differ") {
    val sigs = docs.filter(length(col("text")) > 20)
      .select(col("id"), TextHashes.minhashSig(
        TextHashes.hashedShingles(col("text"), 3), 64).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(1L) == sigs(6L))
    assert(sigs(1L) != sigs(3L))
  }

  test("canon matches the regexp normalization on whitespace/case edges") {
    val cases = Seq(
      "Plain Text Here", "  leading and trailing  ", "tabs\tand\nnewlines",
      "\tstarts with tab", "ends with tab\t", "multi   spaces\t\t\nmix",
      "", "   ", "\t\t", "a", " A ", "already canonical text")
    val out = cases.toDF("t").select(
        TextHashes_canon(col("t")).as("native"),
        regexp_replace(lower(trim(col("t"))), "\\s+", " ").as("regex"))
      .as[(String, String)].collect()
    out.zip(cases).foreach { case ((n, r), c) =>
      assert(n == r, s"canon mismatch on ${c.inspect}")
    }
  }

  private def TextHashes_canon(c: org.apache.spark.sql.Column) =
    graft.functions.CanonText.canon(c)

  private implicit class StrOps(s: String) {
    def inspect: String = s.map {
      case '\t' => "\\t"; case '\n' => "\\n"; case c => c.toString
    }.mkString("\"", "", "\"")
  }

  test("empty/short text: no shingles; simhash still defined") {
    val out = docs.filter(col("id") === 2L || col("id") === 5L)
      .select(size(TextHashes.hashedShingles(col("text"), 3))).as[Int].collect()
    assert(out.toSeq == Seq(0, 0))
    val sh = docs.select(TextHashes.simhash(col("text"))).count()
    assert(sh == 6)
  }
}
