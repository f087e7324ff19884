package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

/** Equivalence specs for the portable md5 hash family backing the
  * shingle/minhash/simhash expressions. Every expected value is
  * derived INDEPENDENTLY of the production code: the base hash via
  * Spark's own `md5` function plus column algebra re-implementing the
  * bytes-8..15-little-endian extraction (the `md5_number_lower`
  * contract), and the lane arithmetic via BigInt (no Mersenne
  * folding) — so these pin both the cross-engine byte-order contract
  * and the mod-2^61−1 algebra of [[PortableHash]].
  */
class TextHashesSpec extends SparkSpec {
  import spark.implicits._

  private val P = PortableHash.P

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "single"),
    (3L, "a  double  spaced  text"), // empty tokens from double spaces
    (4L, "trailing space "),
    (5L, ""),
    (6L, "the quick brown fox jumps over the lazy dog")
  ).toDF("id", "text")

  /** md5-lower-64 mod P from Spark's `md5()` hex output: digest bytes
    * 8..15 read little-endian = the last 16 hex chars taken as 8
    * byte-pairs in reverse order. Independent of PortableHash at every
    * step (different md5 impl, different byte extraction, decimal
    * arithmetic instead of the Mersenne fold). */
  private def md5L64ModP(c: Column): Column = {
    val hex = md5(c)
    val le = concat((15 to 8 by -1).map(i => substring(hex, 2 * i + 1, 2)): _*)
    (conv(le, 16, 10).cast("decimal(20,0)") % lit(P)).cast("long")
  }

  /** JVM twin of the oracle arithmetic: unsigned little-endian BigInt
    * of md5 digest bytes 8..15 (≡ DuckDB `md5_number_lower`). */
  private def refMd5Lower64(s: String): BigInt = {
    val d = MessageDigest.getInstance("MD5")
      .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    (0 until 8).map(i => BigInt(d(8 + i) & 0xff) << (8 * i)).sum
  }

  test("hashedShingles = md5_number_lower(shingle) % P (set equality)") {
    val n = 3
    val viaStrings = docs.select(col("id"),
      transform(Dedup.shingles(col("text"), n), s => md5L64ModP(s)).as("h"))
    val native = docs.select(col("id"),
      TextHashes.hashedShingles(col("text"), n).as("h"))
    val a = viaStrings.as[(Long, Seq[Long])].collect().toMap
    val b = native.as[(Long, Seq[Long])].collect().toMap
    a.foreach { case (id, hs) =>
      assert(hs.toSet == b(id).toSet, s"doc $id shingle hash sets differ")
    }
    // note: "a  double  spaced  text" tokenizes to 4 words on both
    // sides — whitespace runs yield no empty tokens (r9 contract)
  }

  test("tokenization is whitespace-robust: tabs/newlines/runs ≡ single spaces") {
    val pairs = Seq(
      ("one\ttwo   three\nfour five", "one two three four five"),
      ("  leading and trailing  \t", "leading and trailing"),
      ("a\r\nb\fc\u000Bd e", "a b c d e"))
    val df = pairs.toDF("messy", "clean")
    val out = df.select(
        TextHashes.hashedShingles(col("messy"), 3).as("hm"),
        TextHashes.hashedShingles(col("clean"), 3).as("hc"),
        TextHashes.simhash(col("messy")).as("sm"),
        TextHashes.simhash(col("clean")).as("sc"))
      .as[(Seq[Long], Seq[Long], Long, Long)].collect()
    out.zip(pairs).foreach { case ((hm, hc, sm, sc), (m, _)) =>
      assert(hm.toSet == hc.toSet, s"shingles differ on ${m.inspect}")
      assert(sm == sc, s"simhash differs on ${m.inspect}")
    }
    // token-less text: simhash 0, no shingles
    val z = Seq(("", " \t\n")).toDF("a", "b").select(
      TextHashes.simhash(col("a")), TextHashes.simhash(col("b")),
      size(TextHashes.hashedShingles(col("b"), 2))).as[(Long, Long, Int)].head()
    assert(z == ((0L, 0L, 0)))
  }

  test("native simhash matches an independent per-token md5 vote count") {
    def refSimhash(text: String): Long = {
      val votes = new Array[Int](64)
      text.split("[ \t\n\u000B\f\r]+").filter(_.nonEmpty).foreach { tok =>
        val h = refMd5Lower64(tok)
        (0 until 64).foreach { b =>
          if (h.testBit(b)) votes(b) += 1 else votes(b) -= 1
        }
      }
      (0 until 64).foldLeft(0L)((acc, b) =>
        if (votes(b) > 0) acc | (1L << b) else acc)
    }
    val native = docs.select(col("id"),
      TextHashes.simhash(col("text")).as("sh"))
      .as[(Long, Long)].collect().toMap
    docs.select(col("id"), col("text")).as[(Long, String)].collect()
      .foreach { case (id, text) =>
        assert(native(id) == refSimhash(text), s"doc $id simhash differs")
      }
  }

  test("minhashSig: per-slot min of (a_j·e + b_j) mod P, BigInt-checked") {
    val elems = Seq(42L, 7L, 123456789L, P - 1)
    val k = 8
    val expected = (0 until k).map { j =>
      val a = refMd5Lower64("a" + j).mod(BigInt(P) - 1) + 1
      val b = refMd5Lower64("b" + j).mod(BigInt(P))
      elems.map(e => (a * e + b).mod(BigInt(P)).toLong).min
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

  test("minhashBandKeys: per-band Horner fold over GF(P), BigInt-checked") {
    // 8 lanes, 4 bands of 2 — expected keys via plain BigInt Horner
    // (no Mersenne folding), independent of PortableHash.mulAddModP
    val sig = Seq(42L, 7L, P - 1, 0L, 123456789L, 987654321L, 1L, P - 2)
    val bands = 4
    val B = BigInt(PortableHash.GramBase)
    val expected = sig.grouped(sig.length / bands).map(_.foldLeft(BigInt(0))(
      (acc, m) => (acc * B + m).mod(BigInt(P))).toLong).toSeq
    val got = Seq(sig).toDF("sig")
      .select(TextHashes.minhashBandKeys(col("sig"), bands))
      .as[Seq[Long]].head()
    assert(got == expected)
  }

  test("band keys: identical docs share every band; band count = bands") {
    val keys = docs.filter(length(col("text")) > 20)
      .select(col("id"), TextHashes.minhashBandKeys(TextHashes.minhashSig(
        TextHashes.hashedShingles(col("text"), 3), 64), 16).as("bk"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(keys(1L).length == 16)
    assert(keys(1L) == keys(6L))
    assert(keys(1L) != keys(3L))
  }

  test("empty/short text: no shingles; simhash still defined") {
    val out = docs.filter(col("id") === 2L || col("id") === 5L)
      .select(size(TextHashes.hashedShingles(col("text"), 3))).as[Int].collect()
    assert(out.toSeq == Seq(0, 0))
    val sh = docs.select(TextHashes.simhash(col("text"))).count()
    assert(sh == 6)
  }
}
