package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Unigram-LM subword vocabulary training (Kudo 2018, "Subword
  * Regularization" — the SentencePiece-class sibling of [[Bpe]]):
  * instead of greedy pair merges, a vocabulary of candidate pieces is
  * scored as a unigram language model and iteratively re-estimated /
  * pruned; inference is the Viterbi (minimum-cost) segmentation.
  * The trainer modern multilingual pipelines run where BPE's merge
  * order underfits (T5/ALBERT/XLNet vocabularies are unigram-LM).
  *
  * This implementation is the HARD-EM (Viterbi-EM) variant in EXACT
  * INTEGER BIT-SPACE, the repo's [[TextOps.lmSurprisal]] discipline —
  * piece costs are floor-log2 surprisals
  * `cost(p) = len(bin(T+1)) − len(bin(count(p)+1))` over BIGINT
  * counts — so the full training walk (seed → E-step → M-step →
  * prune → apply) replays bit-for-bit in an external SQL engine: no
  * float log-likelihood crosses the gate. Published full EM computes
  * posterior expected counts with forward-backward; hard EM counts
  * the one-best segmentation instead (the k=1 degenerate case of
  * Kudo §3.2's l-best approximation) — the standard exactness trade,
  * and what makes every intermediate an integer.
  *
  * The walk:
  *   1. SEED: candidate pieces = all substrings of corpus words up to
  *      `maxPieceLen` code points, counted freq-weighted; keep the
  *      top `seedSize` ranked by count·length (the SentencePiece seed
  *      heuristic — raw counts rank every single char above every
  *      informative longer piece) plus ALL single code points
  *      (coverage: Viterbi must never dead-end).
  *   2. E-STEP: Viterbi-segment every vocabulary word under current
  *      costs; recount pieces from the segmentations, freq-weighted.
  *   3. M-STEP + PRUNE: keep the top `vocabSize` pieces by new count
  *      (plus all single code points, count 0 if now unused);
  *      recompute costs from the kept counts. Repeat 2–3 `emIters`
  *      times.
  *   4. APPLY: distributed Viterbi under the final costs.
  *
  * Determinism (the oracle contract): every top-k selection orders by
  * (rank DESC, piece ASC in UTF-8 BYTE order — the [[Bpe]] tie rule);
  * Viterbi ties break (cost ASC, start-position ASC), i.e. the
  * LONGEST last piece wins, making the backpointer — hence the
  * segmentation — unique by induction. Words longer than `maxWordLen`
  * take the single-code-point fallback (SentencePiece's max input
  * length posture), which bounds the oracle's dp unroll structurally
  * rather than by data.
  *
  * Scale shape — the [[Bpe.trainMerges]] posture: ONE distributed
  * corpus scan builds the word-frequency table (the only pass that
  * touches corpus-sized data); at most `maxVocab` words train
  * IN MEMORY on the driver (seed counting, Viterbi-EM, prune are all
  * vocab-bounded — substring candidates ≤ |vocab|·maxWordLen·
  * maxPieceLen); the trained cost table (≤ seedSize + |alphabet|
  * rows — driver state by definition) is applied corpus-side in ONE
  * `mapPartitions` pass over the word table, constant plan depth.
  */
object Unigram {

  /** One vocabulary row of the trained model. */
  final case class Piece(piece: String, count: Long, cost_bits: Long)

  /** A Viterbi-segmented word of the corpus vocabulary. */
  final case class SegmentedWord(word: String, freq: Long, seg: String,
      n_tokens: Int)

  /** `length(bin(x+1))` — the binary digit count both engines share
    * ([[TextOps.lmSurprisal]] idiom; x ≥ 0). */
  @inline private def bits1(x: Long): Long =
    64L - java.lang.Long.numberOfLeadingZeros(x + 1)

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** Code-point split (NOT UTF-16 units: SQL `substr`/`len` count
    * code points, and the trainer must segment exactly where the
    * oracle does even beyond the BMP). */
  private[ext] def codePoints(w: String): Array[String] = {
    val out = new Array[String](w.codePointCount(0, w.length))
    var i = 0; var k = 0
    while (i < w.length) {
      val cp = w.codePointAt(i)
      out(k) = new String(Character.toChars(cp))
      k += 1; i += Character.charCount(cp)
    }
    out
  }

  /** Top-`k` pieces under (count·weight DESC, piece UTF-8 ASC), plus
    * every single code point of the corpus (count 0 if absent). */
  private def selectVocab(counts: collection.Map[String, Long], k: Int,
      weightByLen: Boolean, chars: Iterable[String]): Map[String, Long] = {
    def w(p: String): Long = if (weightByLen) p.codePointCount(0, p.length) else 1L
    val top = counts.toSeq
      .sortWith { case ((pa, ca), (pb, cb)) =>
        val ra = ca * w(pa); val rb = cb * w(pb)
        if (ra != rb) ra > rb else utf8Lt(pa, pb)
      }
      .take(k).toMap
    top ++ chars.filterNot(top.contains).map(c => c -> counts.getOrElse(c, 0L))
  }

  private def costsOf(vocab: Map[String, Long]): Map[String, Long] = {
    val tb = bits1(vocab.values.sum)
    vocab.map { case (p, c) => p -> (tb - bits1(c)) }
  }

  /** Minimum-cost segmentation of one word under a piece-cost table;
    * ties break (cost ASC, start-position ASC) per position — the
    * first minimal predecessor in ascending-j scan order, which is
    * the LONGEST last piece. Unique by induction (each dp cell keeps
    * exactly one backpointer), so engines agree string-for-string.
    * Words longer than `maxWordLen` code points fall back to single
    * code points.
    *
    * Alphabet coverage is NOT a precondition (r13 ADVICE #2): a code
    * point absent from the cost table — possible when a SAVED model
    * is applied to a later corpus — emits itself as a single-point
    * fallback piece at a sentinel cost higher than any real path, so
    * a train-once/apply-many job degrades per-character instead of
    * dying. The fallback is only consulted when NO table piece covers
    * a position, so covered-alphabet segmentations (everything the
    * oracles replay) are bit-identical to before. */
  private[ext] def viterbiSeg(cp: Array[String],
      cost: collection.Map[String, Long], maxPieceLen: Int,
      maxWordLen: Int): Array[String] = {
    val L = cp.length
    if (L > maxWordLen) return cp
    val dpCost = new Array[Long](L + 1)
    val dpPtr = new Array[Int](L + 1)
    java.util.Arrays.fill(dpPtr, -1)
    var p = 1
    while (p <= L) {
      var best = Long.MaxValue; var bestJ = -1
      var j = math.max(0, p - maxPieceLen)
      while (j < p) {
        if (j == 0 || dpPtr(j) >= 0) {
          cost.get(cp.slice(j, p).mkString) match {
            case Some(c) =>
              val cand = dpCost(j) + c
              if (cand < best) { best = cand; bestJ = j }
            case None => ()
          }
        }
        j += 1
      }
      if (bestJ < 0) {
        // unseen code point: single-point fallback at a cost above any
        // real path (16 words × 2^40 stays far under Long.MaxValue),
        // so it never competes with a table-covered segmentation
        best = dpCost(p - 1) + (1L << 40); bestJ = p - 1
      }
      dpCost(p) = best; dpPtr(p) = bestJ
      p += 1
    }
    var out = List.empty[String]; var q = L
    while (q > 0) {
      val j = dpPtr(q); out = cp.slice(j, q).mkString :: out; q = j
    }
    out.toArray
  }

  /** The in-memory hard-EM trainer over a (word, freq) vocabulary —
    * see the object scaladoc walk. Returns the final vocabulary rows
    * (UTF-8 piece order) and the cost table [[segment]] applies.
    * Exposed for reuse/testing; [[trainModel]] is the cluster entry
    * point that feeds this from the one-scan word table. */
  def trainLocal(vocab: Seq[(String, Long)], seedSize: Int, vocabSize: Int,
      maxPieceLen: Int = 4, maxWordLen: Int = 16, emIters: Int = 1)
      : (Seq[Piece], Map[String, Long]) = {
    require(seedSize >= 1 && vocabSize >= 1, "seedSize/vocabSize must be >= 1")
    require(maxPieceLen >= 1 && maxWordLen >= maxPieceLen,
      "need maxWordLen >= maxPieceLen >= 1")
    require(emIters >= 1, "emIters must be >= 1")
    val words = vocab.map { case (w, f) => (codePoints(w), f) }
    // seed substring counts, freq-weighted, every occurrence
    val sc = new scala.collection.mutable.HashMap[String, Long]()
    words.foreach { case (cp, f) =>
      var s = 0
      while (s < cp.length) {
        var l = 1
        while (l <= maxPieceLen && s + l <= cp.length) {
          val piece = cp.slice(s, s + l).mkString
          sc.update(piece, sc.getOrElse(piece, 0L) + f)
          l += 1
        }
        s += 1
      }
    }
    val chars = sc.keys.filter(p => p.codePointCount(0, p.length) == 1)
      .toSeq.sortWith(utf8Lt)
    var cur = selectVocab(sc, seedSize, weightByLen = true, chars)
    var costs = costsOf(cur)
    var it = 0
    while (it < emIters) {
      // E-step: one-best counts under current costs
      val e = new scala.collection.mutable.HashMap[String, Long]()
      words.foreach { case (cp, f) =>
        viterbiSeg(cp, costs, maxPieceLen, maxWordLen).foreach { p =>
          e.update(p, e.getOrElse(p, 0L) + f)
        }
      }
      // M-step + prune
      cur = selectVocab(e, vocabSize, weightByLen = false, chars)
      costs = costsOf(cur)
      it += 1
    }
    val rows = cur.toSeq.sortWith { case ((a, _), (b, _)) => utf8Lt(a, b) }
      .map { case (p, c) => Piece(p, c, costs(p)) }
    (rows, costs)
  }

  /** Train over the corpus; returns the model table (piece, count,
    * cost_bits), one row per kept piece. One distributed corpus scan
    * builds the word table; at most `maxVocab` words (freq DESC, word
    * ASC — the [[Bpe.trainMerges]] frequency floor) collect and train
    * in memory. */
  def trainModel(df: DataFrame, textCol: String, seedSize: Int,
      vocabSize: Int, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      emIters: Int = 1, maxVocab: Int = 4 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    train(df, textCol, seedSize, vocabSize, maxPieceLen, maxWordLen,
      emIters, maxVocab)._1.toDF("piece", "count", "cost_bits")
  }

  /** [[trainModel]] returning both the vocabulary rows and the cost
    * table — for callers that train and [[segment]] in one plan. */
  def train(df: DataFrame, textCol: String, seedSize: Int,
      vocabSize: Int, maxPieceLen: Int = 4, maxWordLen: Int = 16,
      emIters: Int = 1, maxVocab: Int = 4 << 20)
      : (Seq[Piece], Map[String, Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = Bpe.wordFreq(df, textCol)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect().toSeq
    trainLocal(vocab, seedSize, vocabSize, maxPieceLen, maxWordLen, emIters)
  }

  /** Persist a trained vocabulary (the [[Bpe.saveModel]] lifecycle):
    * one (piece, count, cost_bits) row per kept piece. */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      pieces: Seq[Piece], path: String): Unit = {
    import spark.implicits._
    pieces.toDF("piece", "count", "cost_bits")
      .coalesce(1).write.mode("overwrite").parquet(path)
  }

  /** Load a [[saveModel]]d vocabulary: the piece rows (UTF-8 order)
    * and the cost table [[segment]] applies. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      path: String): (Seq[Piece], Map[String, Long]) = {
    import spark.implicits._
    val rows = spark.read.parquet(path)
      .select("piece", "count", "cost_bits")
      .as[(String, Long, Long)].collect()
      .sortWith { case ((a, _, _), (b, _, _)) => utf8Lt(a, b) }
      .map { case (p, c, b) => Piece(p, c, b) }.toSeq
    (rows, rows.map(p => p.piece -> p.cost_bits).toMap)
  }

  /** Viterbi-segment each corpus word under a trained cost table:
    * (word, freq, seg, n_tokens), seg '~'-joined — the apply side.
    * `costs` is the driver-held model (≤ seedSize + |alphabet| rows,
    * broadcast with the closure); corpus-side work is the one
    * word-table scan in a single `mapPartitions` pass with constant
    * plan depth (the [[Bpe.segment]] shape). */
  def segment(df: DataFrame, textCol: String, costs: Map[String, Long],
      maxPieceLen: Int = 4, maxWordLen: Int = 16): Dataset[SegmentedWord] =
    segmentWords(Bpe.wordFreq(df, textCol), costs, maxPieceLen, maxWordLen)

  /** [[segment]] over an already-built (word, freq) table (the
    * [[Bpe.segmentWords]] shape — one corpus scan shared across
    * tokenizers). */
  def segmentWords(wf: DataFrame, costs: Map[String, Long],
      maxPieceLen: Int = 4, maxWordLen: Int = 16): Dataset[SegmentedWord] = {
    val spark = wf.sparkSession
    import spark.implicits._
    wf.as[(String, Long)].mapPartitions { rows =>
      rows.map { case (word, freq) =>
        val toks = viterbiSeg(codePoints(word), costs, maxPieceLen, maxWordLen)
        SegmentedWord(word, freq, toks.mkString("~"), toks.length)
      }
    }
  }
}
