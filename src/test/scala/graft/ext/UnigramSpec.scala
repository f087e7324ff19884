package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[Unigram]] against a HAND-COMPUTED hard-EM walk, the Viterbi
  * tiebreak, the long-word fallback, code-point (not UTF-16)
  * segmentation, and distributed-apply ≡ local-trainer agreement.
  */
class UnigramSpec extends SparkSpec {
  import spark.implicits._

  test("trainLocal: the hand-computed EM walk on {abab×10, ab×5, cd×3}") {
    // Seed substring counts (maxPieceLen 2, freq-weighted):
    //   a:25 b:25 ab:25 ba:10 c:3 d:3 cd:3
    // count·length seed rank: ab:50, a:25, b:25 (a<b on the tie) →
    // seed top-3 = {ab, a, b}; + chars c, d.
    //   T0 = 25+25+25+3+3 = 81; cost = len(bin(82)) − len(bin(cnt+1)):
    //   ab/a/b → 7−5 = 2, c/d → 7−3 = 4.
    // Viterbi E-step: abab→ab~ab, ab→ab, cd→c~d ⇒ usage counts
    //   ab: 2·10+5 = 25, c: 3, d: 3 (a, b now UNUSED).
    // Prune to vocabSize 2 by count: ab(25), then c beats d on the
    // 3-count tie (piece ASC); a, b, d re-enter as coverage chars
    // with their usage counts (0, 0, 3).
    //   T1 = 25+3+0+0+3 = 31; costs: ab → 6−5 = 1, c/d → 6−3 = 3,
    //   a/b → 6−1 = 5.
    val (pieces, costs) = Unigram.trainLocal(
      Seq(("abab", 10L), ("ab", 5L), ("cd", 3L)),
      seedSize = 3, vocabSize = 2, maxPieceLen = 2, maxWordLen = 4)
    val rows = pieces.map(p => p.piece -> ((p.count, p.cost_bits))).toMap
    assert(pieces.map(_.piece) == Seq("a", "ab", "b", "c", "d"),
      s"piece set/order: $pieces")
    assert(rows("ab") == ((25L, 1L)), s"ab: ${rows("ab")}")
    assert(rows("c") == ((3L, 3L)) && rows("d") == ((3L, 3L)))
    assert(rows("a") == ((0L, 5L)) && rows("b") == ((0L, 5L)),
      "pruned chars re-enter with usage count 0")
    assert(costs == rows.map { case (p, (_, c)) => p -> c })
    // a second EM iteration is a fixpoint here: the segs under the
    // final costs are the segs that produced them
    val (pieces2, _) = Unigram.trainLocal(
      Seq(("abab", 10L), ("ab", 5L), ("cd", 3L)),
      seedSize = 3, vocabSize = 2, maxPieceLen = 2, maxWordLen = 4,
      emIters = 2)
    assert(pieces2 == pieces, "EM reached its fixpoint after one step")
  }

  test("viterbiSeg: (cost asc, start asc) tiebreak = longest LAST piece wins") {
    val costs = Map("a" -> 2L, "b" -> 2L, "c" -> 2L, "ab" -> 4L, "bc" -> 4L)
    // dp(2): ab(4) ties a+b(4) → j=0 (longer last piece) → "ab";
    // dp(3): a+bc(6) ties ab+c(6) → j=1 beats j=2 → a~bc, NOT ab~c
    val seg = Unigram.viterbiSeg(Unigram.codePoints("abc"), costs,
      maxPieceLen = 2, maxWordLen = 16)
    assert(seg.toSeq == Seq("a", "bc"), s"got ${seg.toSeq}")
    // strictly cheaper long piece wins outright
    val seg2 = Unigram.viterbiSeg(Unigram.codePoints("abc"),
      costs + ("ab" -> 1L), maxPieceLen = 2, maxWordLen = 16)
    assert(seg2.toSeq == Seq("ab", "c"))
  }

  test("words beyond maxWordLen fall back to single code points") {
    val costs = Map("a" -> 1L, "aa" -> 1L)
    val seg = Unigram.viterbiSeg(Unigram.codePoints("aaaaa"), costs,
      maxPieceLen = 2, maxWordLen = 4)
    assert(seg.toSeq == Seq("a", "a", "a", "a", "a"))
  }

  test("code-point segmentation: CJK pieces segment whole, not per UTF-16 unit") {
    val costs = Map("中" -> 5L, "文" -> 5L, "中文" -> 3L)
    val seg = Unigram.viterbiSeg(Unigram.codePoints("中文"), costs,
      maxPieceLen = 2, maxWordLen = 16)
    assert(seg.toSeq == Seq("中文"))
    // and a supplementary-plane char (𝄞, 2 UTF-16 units) is ONE unit
    assert(Unigram.codePoints("a𝄞b").toSeq == Seq("a", "𝄞", "b"))
  }

  test("distributed segment ≡ local viterbi under the trained model") {
    val docs = Seq(
      (1L, "abab ab abab"),
      (2L, "cd ab cd cd"),
      (3L, "abab cd")).toDF("doc_id", "text")
    val (pieces, costs) = Unigram.train(docs, "text",
      seedSize = 4, vocabSize = 3, maxPieceLen = 2, maxWordLen = 4)
    assert(pieces.nonEmpty)
    val dist = Unigram.segment(docs, "text", costs, maxPieceLen = 2,
        maxWordLen = 4)
      .collect().map(s => s.word -> ((s.freq, s.seg, s.n_tokens))).toMap
    val wf = Map("abab" -> 3L, "ab" -> 2L, "cd" -> 4L)
    assert(dist.keySet == wf.keySet)
    wf.foreach { case (w, f) =>
      val local = Unigram.viterbiSeg(Unigram.codePoints(w), costs, 2, 4)
      assert(dist(w) == ((f, local.mkString("~"), local.length)),
        s"$w: ${dist(w)} vs local ${local.toSeq}")
    }
  }
}
