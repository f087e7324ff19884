package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[WordPiece]] against a HAND-COMPUTED likelihood-scored merge
  * walk (including the case where it diverges from BPE's count
  * argmax — the reason the trainer exists), the quantized-key tie
  * rule, the delta-maintained pair/symbol counts against a
  * from-scratch recount reference, greedy '##' segmentation with its
  * '[UNK]' fallbacks, code-point (not UTF-16) symbols, and
  * distributed-apply ≡ local agreement.
  */
class WordPieceSpec extends SparkSpec {
  import spark.implicits._

  private val S = BigInt(WordPiece.ScoreScale)

  test("trainMergesLocal: hand-computed walk on {aa×10, ab×9, xy×2} — " +
      "likelihood argmax diverges from BPE") {
    // pairs (a,a):10 (a,b):9 (x,y):2; symbols a:29 b:9 x:2 y:2.
    // keys: (a,a) 10S/841, (a,b) 9S/261, (x,y) 2S/4 = S/2 → (x,y)
    // wins despite the LOWEST pair count. Then (a,b) at S/29 beats
    // (a,a) at 10S/841; then (a,a) alone; then pair-exhausted stop.
    val vocab = Seq(("aa", 10L), ("ab", 9L), ("xy", 2L))
    val merges = WordPiece.trainMergesLocal(vocab, nMerges = 8)
    assert(merges.map(m => (m.lhs, m.rhs)) ==
      Seq(("x", "y"), ("a", "b"), ("a", "a")), s"merge order: $merges")
    assert(merges.map(_.merged) == Seq("xy", "ab", "aa"))
    assert(merges.map(_.pair_count) == Seq(2L, 9L, 10L))
    assert(merges(0).score_key == (BigInt(2) * S / 4).toLong)
    assert(merges(1).score_key == (BigInt(9) * S / (29 * 9)).toLong)
    assert(merges(2).score_key == (BigInt(10) * S / (20 * 20)).toLong)
    // BPE's count argmax picks (a,a) first on the same vocabulary
    val bpe = Bpe.trainMergesLocal(vocab, nMerges = 1)
    assert(bpe.head._2 == "a" && bpe.head._3 == "a",
      "BPE picks the frequent pair the likelihood score rejects")
  }

  test("trainMergesLocal: equal keys fall to (lhs, rhs) UTF-8 order") {
    // (a,b) and (c,d): both cnt 2 over symbols of count 2 → key S/2
    val merges = WordPiece.trainMergesLocal(
      Seq(("ab", 2L), ("cd", 2L)), nMerges = 2)
    assert(merges.map(_.merged) == Seq("ab", "cd"), s"tie order: $merges")
    assert(merges.map(_.score_key).distinct == Seq((S / 2).toLong))
  }

  test("trainMergesLocal: delta-maintained counts ≡ from-scratch recount " +
      "reference on random vocabularies") {
    def utf8Lt(a: String, b: String): Boolean =
      java.util.Arrays.compareUnsigned(
        a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
        b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0
    // the straightforward trainer: recount pairs + symbols from the
    // word states each step, argmax with the same key, apply
    // String.replace to every word — O(corpus) per step, the semantics
    // the delta walk must preserve
    def reference(vocab: Seq[(String, Long)], nMerges: Int)
        : Seq[(String, String, Long, Long)] = {
      var syms = vocab.map { case (w, f) =>
        (Unigram.codePoints(w).mkString("~"), f) }
      val out = scala.collection.mutable.ArrayBuffer
        .empty[(String, String, Long, Long)]
      var step = 0
      var done = false
      while (step < nMerges && !done) {
        val pairs = new scala.collection.mutable.HashMap[(String, String), Long]()
        val sc = new scala.collection.mutable.HashMap[String, Long]()
        syms.foreach { case (s, f) =>
          val parts = s.split('~')
          parts.foreach(p => sc.update(p, sc.getOrElse(p, 0L) + f))
          parts.sliding(2).foreach {
            case Array(l, r) =>
              pairs.update((l, r), pairs.getOrElse((l, r), 0L) + f)
            case _ => ()
          }
        }
        if (pairs.isEmpty) done = true
        else {
          val ((bl, br), bc) = pairs.toSeq.minBy { case ((l, r), c) =>
            (-(BigInt(c) * S / (BigInt(sc(l)) * sc(r))), l, r)
          }(Ordering.Tuple3(Ordering.BigInt,
            Ordering.fromLessThan(utf8Lt), Ordering.fromLessThan(utf8Lt)))
          val key = BigInt(bc) * S / (BigInt(sc(bl)) * sc(br))
          out += ((bl, br, key.toLong, bc))
          syms = syms.map { case (s, f) => (s.replace(bl + "~" + br, bl + br), f) }
          step += 1
        }
      }
      out.toSeq
    }
    val rnd = new scala.util.Random(42)
    for (trial <- 1 to 30) {
      val alphabet = "abcx"
      val vocab = (0 until 20).map { i =>
        val w = (0 until 1 + rnd.nextInt(6))
          .map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
        (w + i % 3, 1L + rnd.nextInt(20)) // suffix keeps words distinct
      }
      val expected = reference(vocab, 10)
      val got = WordPiece.trainMergesLocal(vocab, 10)
        .map(m => (m.lhs, m.rhs, m.score_key, m.pair_count))
      assert(got == expected, s"trial $trial diverged:\n$got\nvs\n$expected")
    }
  }

  test("segment: greedy longest-match with ## markers; distributed ≡ local") {
    val docs = Seq(
      (0L, "aa ab xy aaab xyab"), (1L, "aa aa aa aa aa aa aa aa aa aa"),
      (2L, "ab ab ab ab ab ab ab ab ab"), (3L, "xy xy"))
      .toDF("doc_id", "text")
    // explicit vocabulary so the greedy expectations are pinned (a
    // trained one can absorb whole words like "aaab" as merges)
    val pieces = Set("a", "b", "x", "y", "aa", "ab", "xy")
    val segs = WordPiece.segment(docs, "text", pieces)
      .collect().map(s => s.word -> s.seg).toMap
    assert(segs("aa") == "aa" && segs("ab") == "ab" && segs("xy") == "xy")
    assert(segs("aaab") == "aa~##ab", s"greedy longest-first: ${segs("aaab")}")
    assert(segs("xyab") == "xy~##ab", s"greedy longest-first: ${segs("xyab")}")
    // train() exposes merges + matching vocab consistently
    val (merges, trained) = WordPiece.train(docs, "text", nMerges = 8)
    assert(merges.map(_.merged).toSet.subsetOf(trained))
    assert(Set("a", "b", "x", "y").subsetOf(trained))
    // distributed ≡ local replay
    val maxPiece = pieces.iterator.map(p => p.codePointCount(0, p.length)).max
    segs.foreach { case (w, s) =>
      val local = WordPiece.greedySeg(Unigram.codePoints(w), pieces,
        maxPiece, 16).map(_.mkString("~")).getOrElse("[UNK]")
      assert(local == s, s"word $w: local $local vs distributed $s")
    }
  }

  test("segment: [UNK] for over-long and unmatchable words") {
    assert(WordPiece.greedySeg(Unigram.codePoints("ab"), Set("b"), 1, 16).isEmpty,
      "unmatchable initial position → None")
    val long = "a" * 17
    assert(WordPiece.greedySeg(Unigram.codePoints(long), Set("a"), 1, 16).isEmpty,
      "17 code points > maxWordLen → None")
    val docs = Seq((0L, s"ok $long")).toDF("doc_id", "text")
    val (_, pieces) = WordPiece.train(docs, "text", nMerges = 2)
    val segs = WordPiece.segment(docs, "text", pieces)
      .collect().map(s => s.word -> ((s.seg, s.n_tokens))).toMap
    assert(segs(long) == (("[UNK]", 1)), s"long word: ${segs(long)}")
  }

  test("code-point symbols: astral chars train and segment whole") {
    // U+10348 (Gothic hwair) is 2 UTF-16 units; a surrogate-split
    // trainer would merge half-characters and never produce "𐍈𐍈"
    val merges = WordPiece.trainMergesLocal(Seq(("𐍈𐍈", 3L)), 2)
    assert(merges.length == 1)
    assert(merges.head.lhs == "𐍈" && merges.head.merged == "𐍈𐍈")
    assert(merges.head.score_key == (BigInt(3) * S / 36).toLong)
    val seg = WordPiece.greedySeg(
      Unigram.codePoints("𐍈𐍈𐍈"),
      Set("𐍈", "𐍈𐍈"), 2, 16)
    assert(seg.map(_.mkString("~")).contains("𐍈𐍈~##𐍈"))
  }
}
