package graft.ext

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.expressions.Window
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

  /** DENSE rank of `df` by `keyCols` in their natural ascending order,
    * appended as `outCol`, plus the total number of distinct keys —
    * ONE range-partitioned sort and two passes sharing its shuffle
    * files (per-partition distinct census with boundary merging, then
    * offset-based assignment), versus the distinct→sort→zipWithIndex→
    * join-back chain this replaced (three shuffles and a recomputed
    * sort per ladder level — measured 2.4 s/level of pure overhead at
    * sf0.1). Keys may be any orderable type incl. arrays; ranks are
    * order-determined, so the output is independent of partition
    * boundaries. The free distinct count is the ladder's early-stop
    * signal. */
  private def denseRankBy(df: DataFrame, keyCols: Seq[String],
      outCol: String, rowsHint: Long = -1L): (DataFrame, Long) = {
    val spark = df.sparkSession
    // size partitions to the data: ~64k rows per range partition, the
    // task-overhead sweet spot for these narrow frames; unknown sizes
    // fall back to the cluster's parallelism
    val maxParts = math.max(1, spark.sparkContext.defaultParallelism)
    val parts =
      if (rowsHint <= 0) maxParts
      else math.min(maxParts, math.max(1L, rowsHint / 65536L)).toInt
    val others = df.columns.filterNot(keyCols.contains).toSeq
    val sorted = df
      .repartitionByRange(parts, keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
      .select((keyCols ++ others).map(col): _*)
    val nk = keyCols.size
    val rdd = sorted.rdd
    def keyOf(row: Row): Seq[Any] = (0 until nk).map(row.get)
    // pass 1: per-partition (#distinct keys, first key, last key)
    val stats = rdd.mapPartitionsWithIndex { (i, it) =>
      var first: Seq[Any] = null; var prev: Seq[Any] = null; var d = 0L
      it.foreach { row =>
        val k = keyOf(row)
        if (prev == null || k != prev) { d += 1; if (first == null) first = k }
        prev = k
      }
      Iterator((i, d, Option(first), Option(prev)))
    }.collect().sortBy(_._1)
    // offsets with cross-partition boundary dedup (a key spanning a
    // partition edge must not count twice)
    val offsets = new Array[Long](stats.length)
    var acc = 0L
    var prevLast: Option[Seq[Any]] = None
    for ((i, d, first, last) <- stats) {
      val adj = if (first.isDefined && first == prevLast) -1L else 0L
      offsets(i) = acc + adj
      acc += d + adj
      if (last.isDefined) prevLast = last
    }
    val bOff = spark.sparkContext.broadcast(offsets)
    // pass 2: assignment (the sort's shuffle files are reused — the
    // exchange stage is skipped on re-execution)
    val out = rdd.mapPartitionsWithIndex { (i, it) =>
      var rank = bOff.value(i)
      var prev: Seq[Any] = null
      it.map { row =>
        val k = keyOf(row)
        if (prev == null || k != prev) rank += 1
        prev = k
        Row.fromSeq((nk until row.size).map(row.get) :+ rank)
      }
    }
    val schema = org.apache.spark.sql.types.StructType(
      others.map(c => sorted.schema(c)) :+
        org.apache.spark.sql.types.StructField(outCol, LongType, nullable = false))
    (spark.createDataFrame(out, schema), acc)
  }

  /** Base prefix length: the doubling ladder starts at rank-by-8-token
    * prefix instead of rank-by-token, collapsing levels 1/2/4/8 into
    * ONE distributed rank assignment — at log-round granularity the
    * pipeline's cost is round LATENCY, not row volume, so halving the
    * ladder (and the LCP descent with it) halves the wall clock. The
    * sub-8 LCP remainder is recovered exactly by one per-row array
    * compare ([[dupLens]]'s fix-up join). */
  private[ext] val BaseLen = 8

  /** The (doc, pos, p) prefix frame: p = the ≤[[BaseLen]]-token prefix
    * ARRAY of the suffix at pos. Arrays (not joined strings) carry the
    * order and the join key: Spark's array<string> ordering IS
    * token-sequence lexicographic order with shorter-prefix-first —
    * a separator-joined string would need a separator sorting below
    * every token character, which no whitespace-split token set
    * guarantees (control chars below 0x20 are legal token bytes). */
  private[ext] def prefixFrame(base: DataFrame): DataFrame =
    base.select(col("doc"), col("__t"),
        posexplode(col("__t")).as(Seq("pos", "tok")))
      .select(col("doc"), col("pos"),
        slice(col("__t"), col("pos") + 1, lit(BaseLen)).as("p"))

  /** Prefix-doubling rank levels over a [[prefixFrame]]: returns
    * `(prefixLen, table(doc, pos, r))` for prefixLen = 8, 16, 32, … —
    * table ranks suffixes by their first `min(prefixLen, remaining)`
    * tokens, with shorter-than-level remainders ranked distinctly
    * from any full-length prefix (base level: distinct array lengths
    * are distinct arrays; doubling: the 0-pad below), which is what
    * makes the LCP descent's equal-rank ⇒ equal-prefix step sound at
    * doc ends. Stops once prefixLen ≥ maxDocLen or all ranks are
    * distinct (then every pairwise LCP < prefixLen, so higher levels
    * can never fire in the descent). */
  private[ext] def rankLevels(prefixes: DataFrame, maxLen: Int): Seq[(Int, DataFrame)] = {
    val nPos = prefixes.count()
    val (ranked0, nd0) = denseRankBy(
      prefixes.select(col("p"), col("doc"), col("pos")), Seq("p"), "r", nPos)
    var cur = ranked0.select(col("doc"), col("pos"), col("r")).localCheckpoint()
    var nDistinct = nd0
    var len = BaseLen
    val levels = scala.collection.mutable.ArrayBuffer[(Int, DataFrame)](len -> cur)
    while (len < maxLen && nDistinct < nPos) {
      // r2 = rank of the suffix `len` positions ahead — positions are
      // contiguous 0..n-1 per doc, so lead(r, len) IS the (doc,
      // pos+len) lookup without a self-join (one doc-partitioned
      // window vs a two-sided shuffle). 0-pad: ranks are ≥ 1, so a
      // suffix ending inside this level keys differently from every
      // continuing one.
      val wDoc = Window.partitionBy(col("doc")).orderBy(col("pos"))
      // checkpoint the window output: the range partitioner's sampling
      // pass would otherwise re-execute the whole window a second time
      val paired = cur.withColumn("r2",
          coalesce(lead(col("r"), len).over(wDoc), lit(0L)))
        .localCheckpoint()
      val (ranked, nd) = denseRankBy(paired, Seq("r", "r2"), "nr", nPos)
      // no checkpoint on cur itself: later reads (next level, descent)
      // re-run only the cheap assignment map over the retained range-
      // shuffle files (stage skipping), and the RANGE-SORTED layout —
      // which the suffix-array step exploits — survives
      cur = ranked.select(col("doc"), col("pos"), col("nr").as("r"))
      nDistinct = nd
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
  private[ext] def dupLens(prefixes: DataFrame, lens: DataFrame, maxLen: Int): DataFrame = {
    val levels = rankLevels(prefixes, maxLen)
    val top = levels.last._2
    // top carries the denseRankBy pass-2 layout — range-partitioned
    // with ranks assigned in sorted order (select/localCheckpoint
    // preserve it), and equal ranks colocate (equal keys range-
    // partition together) — so the suffix-array index needs only a
    // within-partition refinement sort + zipWithIndex, never a second
    // global sort.
    val spark = prefixes.sparkSession
    val saSorted = top.sortWithinPartitions(col("r"), col("doc"), col("pos"))
    val saRdd = saSorted.rdd.zipWithIndex().map { case (row, i) =>
      Row.fromSeq(row.toSeq :+ (i + 1L))
    }
    val sa = spark.createDataFrame(saRdd, saSorted.schema.add("sa_idx", LongType))
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
    // sub-BaseLen fix-up: after the level-8 step the residual LCP is
    // < 8 and the ranks at the current offsets differ — recover it
    // EXACTLY with one per-row common-prefix compare of the ≤8-token
    // prefix arrays (two bounded lookups, no more rounds)
    val pa = prefixes.select(col("doc").as("adoc"), col("pos").as("__pa"),
      col("p").as("__p1"))
    val pb = prefixes.select(col("doc").as("bdoc"), col("pos").as("__pb"),
      col("p").as("__p2"))
    val eqFlags = zip_with(col("__p1"), col("__p2"),
      (x, y) => when(x.isNotNull && y.isNotNull && x === y, lit(1))
        .otherwise(lit(0)))
    val firstMismatch = array_position(eqFlags, 0)
    val common = when(col("__p1").isNull || col("__p2").isNull, lit(0L))
      .when(firstMismatch === 0,
        least(size(col("__p1")), size(col("__p2"))).cast("long"))
      .otherwise(firstMismatch - 1)
    pairs = pairs
      .withColumn("__pa", col("apos") + col("lcp"))
      .withColumn("__pb", col("bpos") + col("lcp"))
      .join(pa, Seq("adoc", "__pa"), "left")
      .join(pb, Seq("bdoc", "__pb"), "left")
      .withColumn("lcp", (col("lcp") + common).cast("int"))
      .drop("__pa", "__pb", "__p1", "__p2")
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
    val lens = base.select(col("doc"), size(col("__t")).as("len"))
    val maxLen = base.agg(coalesce(max(size(col("__t"))), lit(0)))
      .head().getInt(0)
    val marked =
      if (maxLen < minTokens)
        lens.select(col("doc"), lit(0).as("s"), lit(0).as("e")).limit(0)
      else
        dupLens(prefixFrame(base), lens, maxLen)
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
    val lens = base.select(col("doc"), size(col("__t")).as("len"))
    val maxLen = base.agg(coalesce(max(size(col("__t"))), lit(0)))
      .head().getInt(0)
    val best =
      if (maxLen < minTokens) lens.select(col("doc")).limit(0)
        .withColumn("__l", lit(0)).withColumn("__s", lit(-1))
      else
        dupLens(prefixFrame(base), lens, maxLen)
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
