package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class BpeSpec extends SparkSpec {
  import spark.implicits._

  // the classic BPE walkthrough corpus (Sennrich et al. §3.2 shape):
  // word frequencies low×5, lower×2, newest×6, widest×3
  private def corpus = Seq(
    (1L, ("low " * 5) + ("lower " * 2)),
    (2L, ("newest " * 6) + ("widest " * 3))
  ).toDF("doc_id", "text")

  test("trainMerges reproduces the hand-computed merge sequence") {
    val m = Bpe.trainMerges(corpus, "text", nMerges = 4)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toList
    // pair counts over {low:5, lower:2, newest:6, widest:3}:
    // (e,s) 9, (s,t) 9, (l,o) 7, (o,w) 7, (w,e) 8(newest 6 + lower 2), …
    // step 1: count 9 tie between (e,s) and (s,t) → lexicographic (e,s)
    assert(m.head == ((1, "e", "s", "es", 9L)))
    // step 2: (es,t) now 9, beats (w,e) 8 → es+t
    assert(m(1) == ((2, "es", "t", "est", 9L)))
    // step 3: (w,est) is 9 (newest 6 + widest 3)? no — 'west' only in
    // newest (6); widest has (d,est) 3; biggest is now (l,o) 7 vs
    // (o,w) 7 vs (w,est) 6 → lexicographic (l,o)
    assert(m(2) == ((3, "l", "o", "lo", 7L)))
    // step 4: (lo,w) 7 wins
    assert(m(3) == ((4, "lo", "w", "low", 7L)))
  }

  test("segment replays training exactly: segmentation = final training state") {
    val trained = Bpe.trainMerges(corpus, "text", nMerges = 4)
      .orderBy("step").as[(Int, String, String, String, Long)]
      .collect().map(r => (r._2, r._3)).toSeq
    val seg = Bpe.segment(corpus, "text", trained)
      .select($"word".as[String], $"n_tokens".as[Int],
        concat_ws("~", $"tokens").as[String])
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    // after merges es, est, lo, low:
    assert(seg("low") == ((1, "low")))
    assert(seg("lower") == ((3, "low~e~r")))
    assert(seg("newest") == ((4, "n~e~w~est")))
    assert(seg("widest") == ((4, "w~i~d~est")))
  }

  test("early stop: single-character vocabulary runs out of pairs") {
    val tiny = Seq((1L, "a b a b")).toDF("doc_id", "text")
    val m = Bpe.trainMerges(tiny, "text", nMerges = 5)
    assert(m.count() == 0, "no adjacent pairs exist in 1-char words")
  }

  test("incremental trainer ≡ naive full-recount reference on 40 random vocabularies") {
    // the shipped trainer maintains pair counts as per-rewrite deltas
    // and finds candidates through the boundary char-pair index; this
    // reference recomputes EVERYTHING from scratch each step (argmax
    // over a full recount, rewrite by scanning all words) — any index
    // staleness or delta drift diverges the merge sequence
    def naive(vocab: Seq[(String, Long)], nMerges: Int): Seq[(Int, String, String, String, Long)] = {
      var words = vocab.map { case (w, f) => (Unigram.codePoints(w).mkString("~"), f) }
      val out = Seq.newBuilder[(Int, String, String, String, Long)]
      var step = 1
      var done = false
      while (step <= nMerges && !done) {
        val counts = scala.collection.mutable.Map[(String, String), Long]()
        for ((s, f) <- words) {
          val p = s.split('~')
          for (j <- 0 until p.length - 1)
            counts((p(j), p(j + 1))) = counts.getOrElse((p(j), p(j + 1)), 0L) + f
        }
        if (counts.isEmpty) done = true
        else {
          def u8(x: String) = x.getBytes("UTF-8").map(b => (b & 0xff).toChar).mkString
          val ((l, r), c) = counts.toSeq
            .minBy { case ((l, r), c) => (-c, u8(l), u8(r)) }(
              Ordering.Tuple3(Ordering.Long, Ordering.String, Ordering.String))
          out += ((step, l, r, l + r, c))
          words = words.map { case (s, f) => (s.replace(l + "~" + r, l + r), f) }
          step += 1
        }
      }
      out.result()
    }
    val pool = Vector("a", "b", "c", "ab", "abc", "x", "yz", "1", "22")
    for (seed <- 1 to 40) {
      val rnd = new scala.util.Random(seed)
      val vocab = (0 until 5 + rnd.nextInt(25)).map { _ =>
        val w = (0 until 1 + rnd.nextInt(8))
          .map(_ => pool(rnd.nextInt(pool.size))).mkString
        (w, 1L + rnd.nextInt(9))
      }.groupBy(_._1).map { case (w, g) => (w, g.map(_._2).sum) }.toSeq
      val n = 1 + rnd.nextInt(12)
      assert(Bpe.trainMergesLocal(vocab, n) == naive(vocab, n),
        s"seed $seed diverged (vocab=$vocab, nMerges=$n)")
    }
  }

  test("code-point symbols: astral chars merge whole, not as surrogates") {
    // U+10348 is 2 UTF-16 units; a surrogate-split trainer would emit
    // half-character merges the SQL oracle (code-point string_split)
    // can never produce
    val merges = Bpe.trainMergesLocal(Seq(("𐍈𐍈", 3L)), nMerges = 2)
    assert(merges == Seq((1, "𐍈", "𐍈", "𐍈𐍈", 3L)), s"got: $merges")
  }

  test("determinism: repartitioned input trains the identical merge table") {
    val a = Bpe.trainMerges(corpus, "text", nMerges = 4)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    val b = Bpe.trainMerges(corpus.repartition(7), "text", nMerges = 4)
      .as[(Int, String, String, String, Long)].collect().sortBy(_._1).toSeq
    assert(a == b)
  }

  test("trainingVocab: the driver copy is bounded by maxVocab and keeps the most frequent words (freq desc, word asc)") {
    val corpus = Seq(
      "bb bb bb cc cc aa aa dd ee",
      "bb cc aa ff").toDF("text")
    val (_, top3) = Bpe.trainingVocab(corpus, "text", maxVocab = 3)
    // bb:4, aa:3, cc:3 — the aa/cc tie breaks by word asc
    assert(top3 == Seq(("bb", 4L), ("aa", 3L), ("cc", 3L)),
      s"bounded vocab: $top3")
    // the default bound is a truncation guard, not a sample: under it,
    // the copy is the whole vocabulary
    val (wf, all) = Bpe.trainingVocab(corpus, "text")
    assert(all.size == 6 && wf.count() == 6L)
    val bad = intercept[IllegalArgumentException] {
      Bpe.trainingVocab(corpus, "text", maxVocab = 0)
    }
    assert(bad.getMessage.contains("maxVocab"))
  }
}
