package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** EXACT duplicated-substring detection via distributed suffix ranks —
  * the true suffix-array form of the ExactSubstr pass (Lee et al.
  * 2022, "Deduplicating Training Data Makes Language Models Better",
  * arXiv:2107.06499 §3; r13 VERDICT #1), replacing the paper's
  * in-memory suffix-array construction with the standard scalable
  * equivalent: PREFIX-DOUBLING suffix ranking (Manber & Myers 1990)
  * in log(maxDocLen) sort-join rounds, then per-suffix longest-
  * duplicate lengths from LCPs of suffix-array neighbours.
  *
  * What this yields beyond [[Dedup.exactSubstrSpans]]'s sliding-gram
  * coverage: the PER-SUFFIX maximal duplicated-match length
  * (`dup_len`), i.e. the length of the longest substring starting at
  * each position that occurs anywhere else in the corpus — the
  * suffix-array primitive itself, independent of any single threshold
  * L, and without materializing L token copies per position the way
  * L-gram construction must (the memory wall that forces the gram
  * form to small L; the paper's production threshold is 50).
  *
  * COVERAGE THEOREM (what the oracle exploits): the token set covered
  * by `[i, i + dup_len(i))` over all suffixes with `dup_len(i) ≥ L`
  * equals the token set covered by duplicated L-gram windows (all
  * occurrences) — any duplicated span of length ≥ L is tiled by
  * duplicated L-grams, and every duplicated L-gram is itself a
  * duplicated span. Merged maximal runs are therefore identical, so
  * the DuckDB oracle can replay the OUTPUT with the independent
  * sliding-gram formulation while the engine runs suffix ranks: two
  * structurally different algorithms hash-agreeing is the strongest
  * cross-check in the catalog. Unlike [[Dedup.exactSubstrSpans]]
  * (all-but-first policy), this marks ALL occurrences — the paper's
  * released-dups semantics: duplicated text is removed everywhere and
  * unique content survives.
  *
  * Scale shape (everything is |corpus tokens| = N, never N²):
  *   - ranking: ceil(log2 maxDocLen) rounds, each ONE equality self
  *     join on (doc, pos+k) + ONE dense-rank assignment (sort +
  *     distributed zipWithIndex over the DISTINCT pair table);
  *   - suffix-array order: one global sort + zipWithIndex, adjacency
  *     by an equality join on the index;
  *   - LCP: binary descent over the saved rank levels — two bounded
  *     equality joins per level on the N-row adjacency frame;
  *   - spans: one (doc,pos) max-aggregate + the shared
  *     [[Dedup.mergeTokenSpans]] per-doc interval union.
  * No pair join anywhere; ties (verbatim duplicate suffixes) are
  * benign — ranking stops at the doc-length horizon and equal ranks
  * sort by (doc, pos). Every zipWithIndex runs over a totally-ordered
  * frame, so ranks, the suffix array, and the output are
  * partitioning-independent.
  */
object SuffixDedup {

  /** Append a 1-based contiguous `idxName` column in the total order
    * `ord` (which MUST be a total order for determinism): sort, then
    * distributed zipWithIndex (one count pass + one assign pass — the
    * standard scalable dense-rank, no single-partition window). */
  private def withOrderIndex(df: DataFrame, ord: Seq[org.apache.spark.sql.Column],
      idxName: String): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.orderBy(ord: _*)
    val rdd = sorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    spark.createDataFrame(rdd, sorted.schema.add(idxName, LongType))
  }

  /** Prefix-doubling rank levels over a token frame (doc, pos, tok):
    * returns `(prefixLen, table(doc, pos, r))` for prefixLen = 1, 2,
    * 4, … — table ranks suffixes by their first `min(prefixLen,
    * remaining)` tokens, with shorter-than-level remainders ranked
    * distinctly from any full-length prefix (the 0-pad below), which
    * is what makes the LCP descent's equal-rank ⇒ equal-prefix step
    * sound at doc ends. Stops once prefixLen ≥ maxDocLen or all ranks
    * are distinct (then every pairwise LCP < prefixLen, so higher
    * levels can never fire in the descent). */
  private[ext] def rankLevels(toks: DataFrame, maxLen: Int): Seq[(Int, DataFrame)] = {
    val tokRanks = withOrderIndex(
      toks.select(col("tok")).distinct(), Seq(col("tok")), "r")
    var cur = toks.join(tokRanks, "tok")
      .select(col("doc"), col("pos"), col("r")).localCheckpoint()
    val nPos = cur.count()
    // ranks are CONTIGUOUS 1..D by construction (zipWithIndex over the
    // distinct sorted keys), so the all-distinct early-stop test is a
    // cheap max(r), not a distinct-count shuffle
    def nDistinct(t: DataFrame): Long =
      t.agg(coalesce(max(col("r")), lit(0L))).head().getLong(0)
    var len = 1
    val levels = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)](len -> cur)
    while (len < maxLen && nDistinct(cur) < nPos) {
      val shifted = cur.select(col("doc"), (col("pos") - len).as("pos"),
        col("r").as("r2"))
      // 0-pad: ranks are ≥ 1, so a suffix ending inside this level
      // keys differently from every continuing one
      val paired = cur.join(shifted, Seq("doc", "pos"), "left")
        .withColumn("r2", coalesce(col("r2"), lit(0L)))
      val pairRanks = withOrderIndex(
        paired.select(col("r"), col("r2")).distinct(),
        Seq(col("r"), col("r2")), "nr")
      cur = paired.join(pairRanks, Seq("r", "r2"))
        .select(col("doc"), col("pos"), col("nr").as("r")).localCheckpoint()
      len *= 2
      levels += (len -> cur)
    }
    levels.toSeq
  }

  /** Per-suffix longest duplicated-match length: (doc, pos, dup_len)
    * where dup_len = length of the longest prefix of the suffix at
    * (doc, pos) that also occurs at some OTHER (doc', pos') — the max
    * of the LCPs with the suffix-array neighbours (the classical
    * identity: lcp over an SA range is the min of adjacent lcps, so
    * the max against ANY suffix is attained at a neighbour). LCPs run
    * by binary descent over the doubling levels, clamped to the
    * remaining doc length (verbatim-equal short suffixes overshoot by
    * construction of the 0-pad; the clamp is exact there). */
  private[ext] def dupLens(toks: DataFrame, lens: DataFrame, maxLen: Int): DataFrame = {
    val levels = rankLevels(toks, maxLen)
    val top = levels.last._2
    val sa = withOrderIndex(top, Seq(col("r"), col("doc"), col("pos")), "sa_idx")
    val nxt = sa.select((col("sa_idx") - 1).as("sa_idx"),
      col("doc").as("bdoc"), col("pos").as("bpos"))
    var pairs = sa.join(nxt, "sa_idx")
      .select(col("doc").as("adoc"), col("pos").as("apos"),
        col("bdoc"), col("bpos"))
      .withColumn("lcp", lit(0))
    var joined = 0
    for ((len, tbl) <- levels.reverse) {
      val ta = tbl.select(col("doc").as("adoc"), col("pos").as("__pa"),
        col("r").as("__ra"))
      val tb = tbl.select(col("doc").as("bdoc"), col("pos").as("__pb"),
        col("r").as("__rb"))
      pairs = pairs
        .withColumn("__pa", col("apos") + col("lcp"))
        .withColumn("__pb", col("bpos") + col("lcp"))
        .join(ta, Seq("adoc", "__pa"), "left")
        .join(tb, Seq("bdoc", "__pb"), "left")
        .withColumn("lcp",
          when(col("__ra").isNotNull && col("__ra") === col("__rb"),
            col("lcp") + len).otherwise(col("lcp")))
        .drop("__pa", "__pb", "__ra", "__rb")
      joined += 1
      // lineage truncation: two joins per level stack up fast
      if (joined % 3 == 0) pairs = pairs.localCheckpoint()
    }
    val perSuffix = pairs
      .select(col("adoc").as("doc"), col("apos").as("pos"), col("lcp"))
      .unionByName(pairs.select(col("bdoc").as("doc"), col("bpos").as("pos"),
        col("lcp")))
      .groupBy("doc", "pos").agg(max(col("lcp")).as("__l"))
    perSuffix.join(lens, "doc")
      .select(col("doc"), col("pos"),
        least(col("__l"), col("len") - col("pos")).as("dup_len"))
  }

  /** Exact maximal duplicated-substring spans: one row per doc per
    * merged token region covered by a substring of length ≥
    * `minTokens` occurring more than once in the corpus (at ANY
    * offset, within or across documents), ALL occurrences marked.
    * Output (idCol, span_start, span_end, span_tokens), 0-based
    * end-exclusive — the schema of [[Dedup.exactSubstrSpans]], whose
    * non-first-occurrence spans are always a SUBSET of these. */
  def duplicatedSpans(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    val base = df.select(col(idCol).as("doc"),
        TextOps.tokens(col(textCol)).as("__t"))
      .localCheckpoint()
    val toks = base.select(col("doc"),
      posexplode(col("__t")).as(Seq("pos", "tok")))
    val lens = base.select(col("doc"), size(col("__t")).as("len"))
    val maxLen = base.agg(coalesce(max(size(col("__t"))), lit(0)))
      .head().getInt(0)
    val marked =
      if (maxLen < minTokens)
        toks.select(col("doc"), col("pos").as("s"), col("pos").as("e")).limit(0)
      else
        dupLens(toks, lens, maxLen)
          .filter(col("dup_len") >= minTokens)
          .select(col("doc"), col("pos").as("s"),
            (col("pos") + col("dup_len")).as("e"))
    Dedup.mergeTokenSpans(marked).withColumnRenamed("doc", idCol)
  }

  /** Per-document LONGEST duplicated substring — the suffix-array
    * primitive [[duplicatedSpans]] thresholds away: for each doc the
    * maximal `dup_len` over its positions, i.e. the length of the
    * longest token run that occurs anywhere else in the corpus.
    * The contamination-triage number ("how much of this doc is
    * verbatim from elsewhere, at its worst") that no fixed-L gram
    * pass can produce. Output: (idCol, longest_dup_tokens,
    * longest_dup_start) — docs whose best match is below `minTokens`
    * report 0 / -1; the start position is the SMALLEST position
    * attaining the max (deterministic argmax).
    *
    * Oracle form (how the independent SQL replay works): a maximal
    * aligned match of length m between two locations is exactly a run
    * of m−L+1 consecutive duplicated L-gram alignments on one
    * (doc_a, doc_b, pos_a−pos_b) DIAGONAL, so the replay extends
    * aligned 5-gram pairs along diagonals with gaps-and-islands and
    * takes max(run+L−1) per doc — quadratic in duplicated positions
    * (fine for an oracle), while the engine stays in the linear
    * suffix-rank path. */
  def longestMatch(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    val base = df.select(col(idCol).as("doc"),
        TextOps.tokens(col(textCol)).as("__t"))
      .localCheckpoint()
    val toks = base.select(col("doc"),
      posexplode(col("__t")).as(Seq("pos", "tok")))
    val lens = base.select(col("doc"), size(col("__t")).as("len"))
    val maxLen = base.agg(coalesce(max(size(col("__t"))), lit(0)))
      .head().getInt(0)
    val best =
      if (maxLen < minTokens) lens.select(col("doc")).limit(0)
        .withColumn("__l", lit(0)).withColumn("__s", lit(-1))
      else
        dupLens(toks, lens, maxLen)
          .filter(col("dup_len") >= minTokens)
          .groupBy("doc")
          // max length, then smallest attaining position — one
          // map-side-combinable min(struct) like the LPA winner step
          .agg(min(struct((-col("dup_len")).as("nl"), col("pos").as("p"))).as("w"))
          .select(col("doc"), (-col("w.nl")).as("__l"), col("w.p").as("__s"))
    base.select(col("doc"))
      .join(best, Seq("doc"), "left_outer")
      .select(col("doc").as(idCol),
        coalesce(col("__l"), lit(0)).as("longest_dup_tokens"),
        coalesce(col("__s"), lit(-1)).as("longest_dup_start"))
  }

  /** The apply step: tokens covered by [[duplicatedSpans]] drop and
    * each document reassembles in original token order — (id,
    * n_tokens, n_removed, text_dedup), span-free docs pass through.
    * Because ALL occurrences are marked, every copy of a duplicated
    * passage is removed (the released-dups policy); unique content is
    * untouched. */
  def duplicatedSpansApply(df: DataFrame, idCol: String, textCol: String,
      minTokens: Int): DataFrame =
    Dedup.applySpanRemoval(df, idCol, textCol,
      duplicatedSpans(df, idCol, textCol, minTokens), "text_dedup")
}
