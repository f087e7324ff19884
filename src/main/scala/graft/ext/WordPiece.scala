package graft.ext

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** WordPiece subword vocabulary training (Schuster & Nakajima 2012,
  * "Japanese and Korean Voice Search", ICASSP — the trainer behind
  * BERT-family vocabularies), completing the repo's tokenizer triad
  * next to greedy-count [[Bpe]] and unigram-LM [[Unigram]]: merges are
  * still greedy pair merges over the word table, but the winner is the
  * pair that maximizes the LIKELIHOOD GAIN of the merge,
  * `score(l, r) = count(l~r) / (count(l) · count(r))` — a rare pair of
  * rare symbols beats a frequent pair of stopword characters, which is
  * exactly where WordPiece vocabularies diverge from BPE's.
  *
  * Exactness (the oracle contract): the score is a rational; comparing
  * it in IEEE doubles would make the argmax engine-dependent on near
  * ties. The operator therefore DEFINES its selection by the quantized
  * integer key `score_key = floor(count(pair) · 2^40 / (count(l) ·
  * count(r)))` — BigInt on the JVM, HUGEINT in the SQL twin, identical
  * floors by construction (both operands positive). Since
  * `count(pair) ≤ min(count(l), count(r)) ≤ count(l)·count(r)`, the
  * key is ≤ 2^40 and rides a BIGINT column. Ties break (score_key
  * DESC, lhs ASC, rhs ASC in UTF-8 byte order — the [[Bpe]] tie rule).
  * 2^-40 quantization means two pairs whose true ratios differ by less
  * than 2^-40 compare equal and fall to the lexicographic tie — a
  * documented property of the operator, not a portability leak.
  *
  * Symbols are CODE POINTS (the [[Unigram]] discipline — SQL
  * `substr`/`len` count code points, so the trainer must split where
  * the oracle does beyond the BMP), '~'-joined; a merge applies as a
  * literal left-to-right `String.replace` of `l~r` with `lr`, the
  * shared Spark/DuckDB replace semantics the BPE oracle already leans
  * on. Pair counts update delta-only via the [[Bpe]] boundary-indexed
  * rewrite walk; symbol counts update in the SAME group walk (merged
  * group: +f for the new symbol, −f per absorbed part), so one merge
  * step costs O(|candidate bucket|), not a corpus recount.
  *
  * Inference is BERT's WordPieceTokenizer: greedy LONGEST-MATCH-FIRST
  * against the vocabulary (= every single code point of the corpus +
  * each step's merged token — WordPiece keeps all intermediates),
  * non-initial pieces carrying the `##` continuation marker; a word
  * longer than `maxWordLen` code points — or one hitting an
  * unmatchable position — becomes the single token `[UNK]`
  * (max_input_chars_per_word in the reference tokenizer), which is
  * what bounds the oracle's greedy-walk unroll structurally.
  *
  * Scale shape — the [[Bpe.trainMerges]] posture: ONE distributed
  * corpus scan builds the word-frequency table (the only pass over
  * corpus-sized data); at most `maxVocab` words train in memory on the
  * driver; the trained vocabulary (≤ nMerges + |alphabet| strings —
  * driver state by definition) is applied corpus-side in a single
  * `mapPartitions` pass over the word table at constant plan depth.
  */
object WordPiece {

  /** Fixed-point scale of the likelihood-ratio score key. */
  val ScoreScale: Long = 1L << 40

  /** A greedily segmented word of the corpus vocabulary. */
  final case class SegmentedWord(word: String, freq: Long, seg: String,
      n_tokens: Int)

  /** One trained merge: the step's winning pair under the quantized
    * likelihood score. */
  final case class Merge(step: Int, lhs: String, rhs: String,
      merged: String, score_key: Long, pair_count: Long)

  private def utf8Lt(a: String, b: String): Boolean =
    java.util.Arrays.compareUnsigned(
      a.getBytes(java.nio.charset.StandardCharsets.UTF_8),
      b.getBytes(java.nio.charset.StandardCharsets.UTF_8)) < 0

  /** The in-memory likelihood-scored merge trainer over a (word, freq)
    * vocabulary. Structure: the [[Bpe.trainMergesLocal]] delta walk
    * (boundary-char index, non-overlapping replace scan, per-boundary
    * pair-count algebra) extended with symbol counts maintained in the
    * same group walk. Returns one [[Merge]] row per step in training
    * order; stops early when no adjacent pairs remain.
    *
    * Exposed for reuse/testing; [[trainMerges]] is the cluster entry
    * point that feeds this from the one-scan word table. */
  def trainMergesLocal(vocab: Seq[(String, Long)],
      nMerges: Int): Seq[Merge] = {
    require(nMerges > 0, "nMerges must be positive")
    val syms = new Array[String](vocab.size)
    val freqs = new Array[Long](vocab.size)
    var i = 0
    vocab.foreach { case (w, f) =>
      syms(i) = Unigram.codePoints(w).mkString("~"); freqs(i) = f; i += 1
    }
    val counts = new scala.collection.mutable.HashMap[(String, String), Long]()
    def bump(l: String, r: String, f: Long): Unit = {
      val k = (l, r)
      val nv = counts.getOrElse(k, 0L) + f
      if (nv == 0L) counts.remove(k) else counts.update(k, nv)
    }
    val symCounts = new scala.collection.mutable.HashMap[String, Long]()
    def symBump(s: String, f: Long): Unit = {
      val nv = symCounts.getOrElse(s, 0L) + f
      if (nv == 0L) symCounts.remove(s) else symCounts.update(s, nv)
    }
    def addCounts(joined: String, f: Long): Unit = {
      val parts = joined.split('~')
      var j = 0
      while (j < parts.length) {
        symBump(parts(j), f)
        if (j < parts.length - 1) bump(parts(j), parts(j + 1), f)
        j += 1
      }
    }
    val byBoundary =
      new scala.collection.mutable.HashMap[Int, scala.collection.mutable.HashSet[Int]]()
    val keyCounts =
      new Array[scala.collection.mutable.HashMap[Int, Int]](syms.length)
    def index(w: Int, joined: String): Unit = {
      val ks = Bpe.boundaryKeys(joined)
      val kc = new scala.collection.mutable.HashMap[Int, Int]()
      var j = 0
      while (j < ks.length) {
        byBoundary.getOrElseUpdate(ks(j),
          new scala.collection.mutable.HashSet[Int]()).add(w)
        kc.update(ks(j), kc.getOrElse(ks(j), 0) + 1)
        j += 1
      }
      keyCounts(w) = kc
    }
    def dropBoundaryKey(w: Int, k: Int): Unit = {
      val kc = keyCounts(w)
      val nv = kc(k) - 1
      if (nv == 0) {
        kc.remove(k)
        byBoundary.get(k).foreach { s =>
          s.remove(w); if (s.isEmpty) byBoundary.remove(k)
        }
      } else kc.update(k, nv)
    }
    i = 0
    while (i < syms.length) {
      addCounts(syms(i), freqs(i)); index(i, syms(i)); i += 1
    }

    // The [[Bpe]] delta rewrite, with the symbol-count algebra riding
    // the group walk: a group of parts [gs, ge] merged into `rep`
    // gains rep +f and loses each absorbed part −f; singleton groups
    // touch nothing. Pair-count algebra is verbatim Bpe (see the
    // boundary-deletion invariant documented there).
    def rewriteDelta(w: Int, pattern: String, lhsLen: Int): Unit = {
      val old = syms(w)
      val f = freqs(w)
      var del = new Array[Int](4); var nDel = 0
      var at = old.indexOf(pattern)
      if (at < 0) return
      while (at >= 0) {
        if (nDel == del.length) del = java.util.Arrays.copyOf(del, nDel * 2)
        del(nDel) = at + lhsLen; nDel += 1
        at = old.indexOf(pattern, at + pattern.length)
      }
      val parts = old.split('~')
      val tPos = new Array[Int](parts.length - 1)
      var p = 0; var cpos = 0
      while (p < parts.length - 1) {
        cpos += parts(p).length; tPos(p) = cpos; cpos += 1; p += 1
      }
      val deleted = new Array[Boolean](parts.length - 1)
      var d = 0; var b = 0
      while (d < nDel) {
        while (tPos(b) != del(d)) b += 1
        deleted(b) = true
        dropBoundaryKey(w,
          Bpe.boundaryKey(old.charAt(del(d) - 1), old.charAt(del(d) + 1)))
        d += 1
      }
      val sb = new java.lang.StringBuilder(old.length)
      var gs = 0
      var prevRep: String = null
      var prevOld: String = null
      var prevMerged = false
      while (gs < parts.length) {
        var ge = gs
        while (ge < parts.length - 1 && deleted(ge)) {
          bump(parts(ge), parts(ge + 1), -f)
          ge += 1
        }
        val rep =
          if (ge == gs) parts(gs)
          else {
            val m = new java.lang.StringBuilder()
            var t = gs
            while (t <= ge) { m.append(parts(t)); t += 1 }
            m.toString
          }
        if (ge > gs) {
          symBump(rep, f)
          var t = gs
          while (t <= ge) { symBump(parts(t), -f); t += 1 }
        }
        if (prevRep != null) {
          if (prevMerged || ge > gs) {
            bump(prevOld, parts(gs), -f)
            bump(prevRep, rep, f)
          }
          sb.append('~')
        }
        sb.append(rep)
        prevRep = rep; prevOld = parts(ge); prevMerged = ge > gs
        gs = ge + 1
      }
      syms(w) = sb.toString
    }

    val scale = BigInt(ScoreScale)
    val out = scala.collection.mutable.ArrayBuffer.empty[Merge]
    var step = 1
    while (step <= nMerges && counts.nonEmpty) {
      // argmax of the quantized likelihood key; ties (key DESC, l ASC,
      // r ASC in UTF-8 byte order). A pair's symbols always carry
      // positive counts (a counted adjacency implies both occur).
      var bl: String = null; var br: String = null
      var bk = BigInt(-1); var bc = 0L
      counts.foreach { case ((l, r), c) =>
        val key = (BigInt(c) * scale) /
          (BigInt(symCounts(l)) * BigInt(symCounts(r)))
        if (key > bk || (key == bk &&
            (utf8Lt(l, bl) || (l == bl && utf8Lt(r, br))))) {
          bl = l; br = r; bk = key; bc = c
        }
      }
      out += Merge(step, bl, br, bl + br, bk.toLong, bc)
      val pattern = bl + "~" + br
      val bucket = byBoundary.get(Bpe.boundaryKey(bl.last, br.head))
        .map(_.toArray).getOrElse(Array.emptyIntArray)
      var b = 0
      while (b < bucket.length) {
        rewriteDelta(bucket(b), pattern, bl.length)
        b += 1
      }
      step += 1
    }
    out.toSeq
  }

  /** Train `nMerges` WordPiece merges over the corpus; returns the
    * merge table (step, lhs, rhs, merged, score_key, pair_count) —
    * one row per merge in training order. One distributed corpus scan
    * builds the word table; at most `maxVocab` words (freq DESC, word
    * ASC — the [[Bpe.trainMerges]] frequency floor) collect and train
    * in memory. */
  def trainMerges(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 4 << 20): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    trainLocalFrom(df, textCol, nMerges, maxVocab)._1
      .toDF("step", "lhs", "rhs", "merged", "score_key", "pair_count")
  }

  private def trainLocalFrom(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int): (Seq[Merge], Seq[(String, Long)]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val vocab = Bpe.wordFreq(df, textCol)
      .orderBy(col("freq").desc, col("word").asc)
      .limit(maxVocab)
      .as[(String, Long)].collect().toSeq
    (trainMergesLocal(vocab, nMerges), vocab)
  }

  /** The matching vocabulary of a trained model: every single code
    * point of the word table (coverage) plus each step's merged token
    * — WordPiece keeps all intermediate merges as vocabulary entries. */
  def vocabOf(merges: Seq[Merge], words: Iterable[String]): Set[String] = {
    val chars = scala.collection.mutable.HashSet.empty[String]
    words.foreach(w => Unigram.codePoints(w).foreach(chars.add))
    chars.toSet ++ merges.map(_.merged)
  }

  /** Greedy longest-match-first segmentation of one word (as code
    * points); None when the word exceeds `maxWordLen` code points or
    * hits an unmatchable position — the caller's `[UNK]`. */
  private[ext] def greedySeg(cp: Array[String], pieces: Set[String],
      maxPieceLen: Int, maxWordLen: Int): Option[Array[String]] = {
    val L = cp.length
    if (L > maxWordLen) return None
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var pos = 0
    while (pos < L) {
      var l = math.min(maxPieceLen, L - pos); var found = 0
      while (l >= 1 && found == 0) {
        if (pieces.contains(cp.slice(pos, pos + l).mkString)) found = l
        l -= 1
      }
      if (found == 0) return None
      val piece = cp.slice(pos, pos + found).mkString
      out += (if (pos == 0) piece else "##" + piece)
      pos += found
    }
    Some(out.toArray)
  }

  /** Segment each corpus word with a trained model: (word, freq, seg,
    * n_tokens), seg '~'-joined with `##` continuation markers, or the
    * single token `[UNK]` for over-long/unmatchable words. `pieces` is
    * the driver-held vocabulary ([[vocabOf]] — ≤ nMerges + |alphabet|
    * strings, broadcast with the closure); corpus-side work is the one
    * word-table scan in a single `mapPartitions` pass with constant
    * plan depth (the [[Bpe.segment]] shape). */
  def segment(df: DataFrame, textCol: String, pieces: Set[String],
      maxWordLen: Int = 16): Dataset[SegmentedWord] =
    segmentWords(Bpe.wordFreq(df, textCol), pieces, maxWordLen)

  /** [[segment]] over an already-built (word, freq) table (the
    * [[Bpe.segmentWords]] shape — one corpus scan shared across
    * tokenizers). */
  def segmentWords(wf: DataFrame, pieces: Set[String],
      maxWordLen: Int = 16): Dataset[SegmentedWord] = {
    val spark = wf.sparkSession
    import spark.implicits._
    val maxPieceLen =
      if (pieces.isEmpty) 1
      else pieces.iterator.map(p => p.codePointCount(0, p.length)).max
    wf.as[(String, Long)].mapPartitions { rows =>
      rows.map { case (word, freq) =>
        greedySeg(Unigram.codePoints(word), pieces, maxPieceLen, maxWordLen) match {
          case Some(toks) =>
            SegmentedWord(word, freq, toks.mkString("~"), toks.length)
          case None => SegmentedWord(word, freq, "[UNK]", 1)
        }
      }
    }
  }

  /** Persist a trained model (the [[Bpe.saveModel]] lifecycle): the
    * merge table under `root/merges` (audit + retraining seed) and the
    * resolved matching vocabulary under `root/pieces` (what
    * [[segment]] needs — resolved at save time so a later job doesn't
    * need the training corpus alphabet). */
  def saveModel(spark: org.apache.spark.sql.SparkSession,
      merges: Seq[Merge], pieces: Set[String], root: String): Unit = {
    import spark.implicits._
    merges.toDF("step", "lhs", "rhs", "merged", "score_key", "pair_count")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/merges")
    pieces.toSeq.sorted.toDF("piece")
      .coalesce(1).write.mode("overwrite").parquet(s"$root/pieces")
  }

  /** Load a [[saveModel]]d model: merge rows in training order plus
    * the matching vocabulary set. */
  def loadModel(spark: org.apache.spark.sql.SparkSession,
      root: String): (Seq[Merge], Set[String]) = {
    import spark.implicits._
    val merges = spark.read.parquet(s"$root/merges")
      .select("step", "lhs", "rhs", "merged", "score_key", "pair_count")
      .as[(Int, String, String, String, Long, Long)].collect()
      .sortBy(_._1)
      .map(r => Merge(r._1, r._2, r._3, r._4, r._5, r._6)).toSeq
    val pieces = spark.read.parquet(s"$root/pieces")
      .select("piece").as[String].collect().toSet
    (merges, pieces)
  }

  /** Train and return both the merge rows and the matching vocabulary
    * — for callers that train and [[segment]] in one plan. */
  def train(df: DataFrame, textCol: String, nMerges: Int,
      maxVocab: Int = 4 << 20): (Seq[Merge], Set[String]) = {
    val (merges, vocab) = trainLocalFrom(df, textCol, nMerges, maxVocab)
    (merges, vocabOf(merges, vocab.map(_._1)))
  }
}
