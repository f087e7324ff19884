package graft.functions

import org.apache.spark.sql.functions._
import graft.SparkSpec

class CdcChunkingSpec extends SparkSpec {
  import spark.implicits._

  private def starts(texts: String*): Seq[Seq[Int]] =
    texts.toSeq.toDF("text")
      .select(CdcChunking.cdcChunkStarts(col("text"), 8, 64).as("s"))
      .as[Seq[Int]].collect().toSeq

  /** Independent reimplementation of the boundary rule over code
    * points — the spec's own oracle. */
  private def expected(text: String, k: Int = 8, d: Int = 64): Seq[Int] = {
    val cps = text.codePoints().toArray
    val grams = math.max(cps.length - k + 1, 1)
    val hashes = (0 until grams).map { i =>
      cps.slice(i, math.min(i + k, cps.length))
        .foldLeft(0L)((acc, c) => PortableHash.mulAddModP(
          PortableHash.GramBase, acc, c))
    }
    0 +: (0 until grams).collect {
      case i if hashes(i) % d == 0 && i + k < cps.length => i + k
    }
  }

  test("boundary rule matches the independent code-point walk") {
    val docs = Seq(
      "the quick brown fox jumps over the lazy dog " * 8,
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa",
      "unicode é ñ 中文 mixed content stream " * 10,
      "short", "", "exactly8")
    val got = starts(docs: _*)
    docs.zip(got).foreach { case (t, s) =>
      assert(s == expected(t), s"text of length ${t.length}")
    }
    assert(got(3) == Seq(0) && got(4) == Seq(0) && got(5) == Seq(0),
      "short/empty docs are one chunk starting at 0")
  }

  test("shift robustness: a prefix edit leaves later boundaries on the same text") {
    // build a base long enough to carry several boundaries, then
    // prepend an edit; every base chunk after the first boundary must
    // reappear VERBATIM in the edited doc — the property fixed-offset
    // windows cannot have
    val base = (1 to 60).map(i => s"sentence number $i with filler words")
      .mkString(" ")
    val edited = "A FRESHLY INSERTED LEAD PARAGRAPH. " + base
    val Seq(sb) = starts(base)
    assert(sb.length >= 3, s"fixture needs boundaries, got $sb")
    def chunks(text: String, s: Seq[Int]): Seq[String] = {
      val b = s :+ text.length
      s.indices.map(i => text.substring(b(i), b(i + 1)))
    }
    val Seq(se) = starts(edited)
    val baseTail = chunks(base, sb).drop(1)
    val editedSet = chunks(edited, se).toSet
    assert(baseTail.forall(editedSet.contains),
      "all post-boundary base chunks must survive the prefix edit")
  }

  test("cdcChunkReport: shared tails counted, unique docs report zero") {
    val tail = (1 to 40).map(i => s"shared trailing sentence $i").mkString(" ")
    val docs = Seq(
      (1L, "first unique head. " + tail),
      (2L, "a different head entirely! " + tail),
      (3L, "completely unrelated text about something else altogether"))
      .toDF("doc_id", "text")
    val r = graft.ext.Dedup.cdcChunkReport(docs, "doc_id", "text")
      .collect().map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2), x.getLong(3)))
      .toMap
    assert(r(1L)._2 > 0 && r(2L)._2 > 0, s"shared tail must be found: $r")
    assert(r(3L)._2 == 0 && r(3L)._3 == 0, s"unique doc must report zero: $r")
    assert(r(1L)._3 > 100, s"shared char mass should cover most of the tail: $r")
  }
}
