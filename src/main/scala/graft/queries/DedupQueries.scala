package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** Text/embedding dedup families and split assignment/leakage/repair. */
trait DedupQueries extends QueriesBase {

  // ====================================================== [EXT] dedup

  val dedupExact: Q = (s, dir) =>
    Dedup.exactGroups(Tables.documents(s, dir), "doc_id", "text")

  val dedupNgram: Q = (s, dir) =>
    Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
      n = 3, threshold = 0.5, maxDocFreq = 50)

  /** Exact-Jaccard pairs through prefix-filtering candidates
    * ([[Dedup.prefixFilterPairs]]): the UNCAPPED true-Jaccard
    * relation — hot shingles are excluded from candidate buckets by
    * the rarest-first global order instead of a df-cap that changes
    * the metric. Oracle = the plain exhaustive shingle join; the
    * prefix machinery must reproduce it exactly (no false negatives
    * is the prefix theorem, verified per-release by this gate). */
  val dedupPrefixJoin: Q = (s, dir) =>
    Dedup.prefixFilterPairs(Tables.documents(s, dir), "doc_id", "text",
      n = 3, threshold = 0.5)

  /** MinHash-LSH near-dup pairs. `maxBucket = 200` closes the one
    * quadratic door the defaults leave open: a band bucket holding
    * >200 docs is an exact-dup cluster or degenerate boilerplate —
    * C(bucket, 2) pair enumeration there belongs to the cluster form
    * ([[dedupMinhashClusters]]), not the pair form. The oracle mirrors
    * the cap on the band-slice buckets. */
  val dedupMinhashLsh: Q = (s, dir) =>
    Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id", "text",
      maxBucket = 200)

  /** Linear-output dedup: (doc, cluster-representative) assignments.
    * Hash-checked: the portable md5 hash family makes the banding and
    * label propagation exactly replayable in the DuckDB oracle; the
    * 100k-doc scale smoke pins runtime. */
  val dedupMinhashClusters: Q = (s, dir) =>
    Dedup.minhashClusters(Tables.documents(s, dir), "doc_id", "text")

  val dedupSimhash: Q = (s, dir) =>
    Dedup.simhashPairs(Tables.documents(s, dir), "doc_id", "text", maxHamming = 3)

  /** Content-defined-chunking dedup report (rsync/LBFS boundaries):
    * rolling-hash chunk starts, per-doc shared-chunk census — the
    * shift-robust chunk modality; hash-checked (the boundary rule is
    * the winnowing polynomial replayed in HUGEINT). */
  val dedupCdc: Q = (s, dir) =>
    Dedup.cdcChunkReport(Tables.documents(s, dir), "doc_id", "text",
      k = 8, divisor = 64)

  /** Winnowing containment dedup — hash-checked: the rolling
    * polynomial gram hash is replayed by the oracle in HUGEINT
    * arithmetic over `unicode(substr(...))`. */
  val dedupWinnowing: Q = (s, dir) =>
    Dedup.winnowingContainmentPairs(Tables.documents(s, dir), "doc_id", "text",
      threshold = 0.3)

  /** Near-dup GROUPS from the n-gram pair graph: connected components
    * collapse transitive duplicate chains (a~b, b~c → one group) —
    * pairs are the metric, components are what curation acts on.
    * Exact recursive-SQL oracle over the identical pair set. */
  val dedupComponents: Q = (s, dir) =>
    graft.operators.ConnectedComponents.run(
      Dedup.ngramJaccardPairs(Tables.documents(s, dir), "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 50),
      "id_a", "id_b")

  val dedupEmbedding: Q = (s, dir) =>
    Dedup.embeddingCosinePairs(Tables.embeddings(s, dir), "vec_id", "embedding",
      "label", threshold = 0.4)

  /** SemDeDup semantic dedup verdicts over the embedding corpus:
    * deterministic min-md5 coarse centers (the engine-portable stand-in
    * for k-means — the whole pipeline hash-checks, where [[Ivf]]'s
    * k-means carries a recall bound instead), TWO-LEVEL argmax-cosine
    * assignment (16 centers through 4 super-centers here; O(N·√k·d)
    * compute with only the √k supers broadcast, since production
    * scales k with the corpus — see [[ext.SemDedup.assignTwoLevel]]),
    * within-cluster cosine pairs, connected-component groups, keep the
    * min id. */
  val dedupSemantic: Q = (s, dir) =>
    SemDedup.semanticDedup(Tables.embeddings(s, dir), "vec_id", "embedding",
      nCenters = 16, threshold = 0.4)

  /** Cross-split leakage audit — the decontamination check that runs
    * AFTER splitting: near-dup pairs (MinHash-LSH, the production
    * screen) whose members landed in different train/val/test splits.
    * Any row here is an eval document whose near-copy trains the
    * model. Same split assignment as [[splitAssign]], same pair screen
    * as [[dedupMinhashLsh]]; the split column is a per-row hash (no
    * shuffle), so the audit costs one LSH pair screen plus two
    * AQE-sized joins of the (tiny) pair set against the doc→split
    * projection. */
  val splitLeakage: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 200)
    val sp = Splits.assign(docs.select("doc_id"), "doc_id",
        SplitWeights, salt = SplitSalt)
      .select(col("doc_id"), col("split"))
    pairs
      .join(sp.toDF("id_a", "split_a"), "id_a")
      .join(sp.toDF("id_b", "split_b"), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .select("id_a", "id_b", "split_a", "split_b", "jaccard")
  }

  /** Threshold-tuning observability for the near-dup family: the
    * similarity distribution of ALL verified LSH candidates (verify
    * floor 0) as decile buckets, with the running count of pairs at or
    * above each decile — exactly the curve read before choosing the
    * production verify threshold the dedup operators hardcode. Bucket
    * arithmetic is integer (round(j·10⁴) div 1000), no float-boundary
    * drift; the final window runs over ≤ 11 rows. */
  val dedupThresholdSweep: Q = (s, dir) => {
    val pairs = Dedup.minhashLshPairs(Tables.documents(s, dir), "doc_id",
      "text", verifyThreshold = 0.0, maxBucket = 200)
    val hist = pairs
      .withColumn("bucket",
        expr("CAST(round(jaccard * 10000) AS BIGINT) div 1000"))
      .groupBy("bucket").agg(count(lit(1)).as("n_pairs"))
    val w = Window.orderBy(col("bucket").desc)
      .rowsBetween(Window.unboundedPreceding, 0)
    hist.withColumn("n_at_or_above", sum("n_pairs").over(w))
  }

  /** Split repair: every near-dup component spanning two splits moves
    * whole to train — the audit's actionable follow-up; zero
    * cross-split pairs remain afterwards (see
    * [[graft.ext.Splits.repairLeakage]]). Shares the production
    * split config and the LSH pair machinery with `split_leakage`. */
  val splitRepair: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 200)
    val assigned = Splits.assign(docs.select("doc_id"), "doc_id",
        SplitWeights, salt = SplitSalt)
      .select(col("doc_id"), col("split"))
    Splits.repairLeakage(assigned, pairs)
  }

  /** The curation-to-mixture funnel in ONE DAG — the r10 additions
    * composed end to end: corpus-statistic gates (Gopher battery ∧
    * boilerplate-gram keep, both trained on the RAW corpus — training
    * the gram-df on survivors would shift the statistic), minhash
    * canonical near-dedup over the gated subset, then the per-source
    * token-budget mixture over the deduped survivors. Output = the
    * selected mixture (doc, source, tokens, fill position). The gated
    * corpus is materialized once for the cluster keep-set and the
    * budget stage (the curate_corpus_near persist-boundary pattern;
    * DISK_ONLY on a cluster). */
  val curateCorpusMix: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bp = TextOps.boilerplateSignals(docs, minDocFreq = 20)
    val gated = docs
      .join(bp.filter(col("keep")).select("doc_id"), Seq("doc_id"), "left_semi")
      .filter(TextOps.gopherKeep(col("text")))
      .select("doc_id", "source", "text")
      .localCheckpoint()
    val keep = Dedup.minhashClusters(gated, "doc_id", "text")
      .filter(col("doc") === col("cluster"))
      .select(col("doc").as("doc_id"))
    val deduped = gated.join(keep, Seq("doc_id"), "left_semi")
    Sampling.tokenBudgetSample(deduped, "doc_id", "source",
        TextOps.tokenCount(col("text")),
        budgets = Seq("src0" -> 2000L, "src1" -> 500L),
        defaultBudget = 1000L, salt = "graft")
      .filter(col("kept"))
      .select("doc_id", "source", "n_tokens", "cum_before")
  }

  /** Benchmark decontamination: every-20th doc plays the held-out eval
    * set; training docs sharing ≥1 distinct 5-gram with it are flagged
    * with overlap counts. Benchmark shingles broadcast; corpus
    * unshuffled. */
  /** Span-level decontamination (the GPT-3 appendix-C surgical form):
    * merged train-doc regions whose 5-grams appear anywhere in the
    * benchmark slice — remove the window, keep the document. Same
    * bench/train split as [[decontamOverlap]]. */
  val decontamSpans: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Decontam.contaminatedSpans(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", minTokens = 5)
  }

  /** Benchmark-side EXACT substring decontamination via suffix ranks
    * (r15, r14 VERDICT #5): every train region sharing a ≥5-token
    * verbatim run with the benchmark slice, computed by ranking
    * train ∪ bench suffixes and LCP-ing each train suffix against its
    * nearest bench neighbours — a structurally different engine from
    * [[decontamSpans]]'s gram probe, hash-checked against the SAME
    * independent gram-coverage oracle (the cross-side coverage
    * theorem on [[graft.ext.SuffixDedup.benchOverlapSpans]] says the
    * outputs must be identical). Closes the corpus-internal vs
    * corpus-vs-benchmark dedup-strength parity. */
  val decontamSubstringExact: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ext.SuffixDedup.benchOverlapSpans(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", minTokens = 5)
  }

  /** Per-train-doc LONGEST verbatim overlap with the benchmark suite —
    * the eval-contamination triage number no fixed-L gram pass can
    * produce ([[dedupLongestMatch]]'s contract, cross-corpus). Oracle:
    * the diagonal-run extension of aligned train×bench 5-gram pairs
    * (exact by the run↔maximal-match bijection), quadratic for the
    * replay while the engine stays in the linear suffix-rank path. */
  val decontamLongestBench: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    graft.ext.SuffixDedup.benchLongestOverlap(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", minTokens = 5)
  }

  /** Per-language EVAL-CONTAMINATION rollup — the corpus-health report
    * for benchmark leakage, the [[reportDupCoverage]] mirror on the
    * bench axis: how much of each language slice is verbatim benchmark
    * text (≥5-token overlaps, merged spans), how many docs carry any.
    * The number an eval-hygiene review reads FIRST. Spans from the
    * suffix engine ([[graft.ext.SuffixDedup.benchOverlapSpans]]);
    * merged spans are disjoint per doc so the covered-token sum is
    * exact integers + one mirrored share division. */
  val reportBenchContamination: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val perDoc = graft.ext.SuffixDedup.benchOverlapSpans(
        train, docs.filter(col("doc_id") % 20 === 0),
        "doc_id", "text", minTokens = 5)
      .groupBy("doc_id").agg(sum(col("span_tokens")).as("__contam"))
    train.select(col("doc_id"), col("lang"),
        size(graft.ext.TextOps.tokens(col("text"))).cast("long").as("__nt"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        coalesce(sum(col("__contam")), lit(0L)).as("n_contam_tokens"),
        count(when(col("__contam") > 0, 1)).as("n_docs_contaminated"))
      .withColumn("contam_share",
        round(col("n_contam_tokens") * 10000.0 / col("n_tokens")) / 1e4)
  }

  /** [[decontamSpans]]'s apply step: contaminated tokens drop, train
    * docs reassemble, clean docs pass through. */
  val decontamSpansClean: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Decontam.cleanSpans(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", minTokens = 5)
  }

  val decontamOverlap: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Decontam.overlapStats(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 5)
  }

  /** [[decontamOverlap]] through the bloom-prefilter path: the same
    * benchmark split, but the (doc, shingle) stream is culled by a
    * bloom bitset BEFORE the exact-confirm join — the plan for when
    * the eval-suite shingle set outgrows broadcast. The bitset is
    * auto-sized from the bench's distinct-shingle count (16 bits per
    * shingle, FP ≈ 0.2%), so the prefilter keeps its selectivity at
    * every SF instead of saturating as the bench grows (r8 ADVICE #2).
    * Output ≡ decontam_overlap (bloom admits no false negatives; the
    * exact join kills false positives), so it shares the exact-SQL
    * oracle. */
  val decontamBloom: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Decontam.overlapStatsBloom(
      docs.filter(col("doc_id") % 20 =!= 0),
      docs.filter(col("doc_id") % 20 === 0),
      "doc_id", "text", n = 5, kProbes = 4)
  }

  /** SEMANTIC decontamination over the embedding corpus: every-20th
    * vector plays the held-out benchmark ([[decontamOverlap]]'s split
    * convention); corpus vectors whose 4-dp cosine to ANY bench item
    * clears 0.4 are flagged with hit counts and the max cosine — the
    * paraphrase-leakage pass the n-gram/bloom/span family
    * structurally misses (a translated benchmark item shares no
    * 8-gram with its source). Bench broadcast, corpus unshuffled;
    * see [[Decontam.semanticOverlap]]. */
  val decontamSemantic: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    Decontam.semanticOverlap(
      e.filter(col("vec_id") % 20 =!= 0),
      e.filter(col("vec_id") % 20 === 0),
      "vec_id", "embedding", floor = 0.4)
  }

  /** Deterministic 80/10/10 split keyed on md5(doc_id‖salt) — stable
    * under re-reads/appends, engine-portable (oracle reproduces it). */
  val splitAssign: Q = (s, dir) =>
    Splits.assign(Tables.documents(s, dir).select("doc_id"), "doc_id",
        SplitWeights, salt = SplitSalt)
      .select("doc_id", "bucket", "split")

  /** Incremental ingestion dedup: odd-id docs are the "new batch",
    * even-id docs the already-ingested corpus; keep new docs whose
    * canonical fingerprint is unseen. */
  val dedupIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Dedup.newAgainstReference(
      docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text"),
      docs.filter(col("doc_id") % 2 === 0),
      "doc_id", "text")
  }

  /** Incremental NEAR-dup screen: the odd-id batch against the even-id
    * corpus via LSH band collision + exact-Jaccard verify — catches the
    * re-crawl the exact-fingerprint form misses. Hash-checked end to
    * end on the portable hash family (maxBucket mirrors
    * [[dedupMinhashLsh]]). */
  val dedupIncrementalNear: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    Dedup.newAgainstReferenceNear(
      docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text"),
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text"),
      "doc_id", "text", maxBucket = 200)
  }

  /** [[dedupIncrementalNear]] from SAVED STATE (r17 — the
    * self-accumulating near-dup screen's production posture): the
    * reference corpus's shingles and LSH bands persist as bucketed
    * tables under a fresh root (the fold
    * [[graft.streaming.CorpusStreams.nearDupScreenStream]] pays per
    * kept batch), the batch probes the reconstructed index through
    * the catalog scans, and the output hash-matches the SAME replay
    * as the in-memory form. */
  val dedupIncrementalNearSaved: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_near_state").toString + "/state"
    Dedup.updateSavedNearDupState(root,
      docs.filter(col("doc_id") % 2 === 0).select("doc_id", "text"),
      "doc_id", "text", batchId = 0L)
    Dedup.newAgainstIndex(
      docs.filter(col("doc_id") % 2 =!= 0).select("doc_id", "text"),
      Dedup.savedNearDupIndex(s, root, batchId = 1L),
      "doc_id", "text", maxBucket = 200)
  }

  /** EMBEDDING-COSINE incremental screen: the odd-id batch against the
    * even-id corpus via the deterministic frozen quantizer (centers =
    * the reference's md5-min draw) + same-cluster 4-dp cosine ≥ 0.4 —
    * the paraphrase re-crawl that shares no shingles with its source
    * and therefore passes [[dedupIncrementalNear]] untouched.
    * Hash-checked end to end: the quantizer, the blocking, and the
    * cosine floor all replay exactly in SQL. */
  val dedupIncrementalSemantic: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    SemDedup.newAgainstReferenceSemantic(
      e.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding"),
      e.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding"),
      "vec_id", "embedding", nCenters = 16, floor = 0.4,
      maxCluster = 100000)
  }

  /** [[dedupIncrementalSemantic]] from SAVED STATE (the
    * [[graft.streaming.CorpusStreams.semanticScreenStream]] posture):
    * the even-id corpus folds into a fresh state root — freezing the
    * quantizer and persisting the assignment as a bucketed table —
    * and the odd-id batch probes it through the catalog scan. Output
    * hash-matches the SAME replay as the in-memory form (shared SQL
    * val): any drift in what the saved tables reconstruct fails the
    * gate. */
  val dedupIncrementalSemanticSaved: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_sem_state").toString + "/state"
    SemDedup.updateSavedSemanticState(root,
      e.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding"),
      "vec_id", "embedding", nCenters = 16, batchId = 0L)
    SemDedup.newAgainstSavedSemantic(
      e.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding"),
      root, "vec_id", "embedding", floor = 0.4, batchId = 1L,
      maxCluster = 100000)
  }

  /** RE-CENTER lifecycle of the saved semantic state (the r17 `weak`
    * closed end to end): the even-id corpus folds under a DELIBERATELY
    * small quantizer (8 centers — the drifted/undersized state the
    * occupancy monitor flags), [[graft.ext.SemDedup
    * .recenterSavedSemanticState]] re-quantizes the state to 16
    * centers through the crash-convergent rebuild protocol (marker
    * re-pinned, survivors re-assigned, provenance preserved), and the
    * odd-id batch probes the re-centered state under the hot-cluster
    * guard. Because the re-draw is the same md5-min rule over the
    * state's docs, the re-centered state is bit-identical to one
    * frozen from scratch at 16 — so the output hash-matches the SAME
    * replay as [[dedupIncrementalSemantic]] (shared SQL val): a
    * re-center that lost a survivor, kept a stale assignment, or
    * pinned the wrong count fails the gate. */
  val dedupSemanticRecenter: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_sem_recenter").toString + "/state"
    SemDedup.updateSavedSemanticState(root,
      e.filter(col("vec_id") % 2 === 0).select("vec_id", "embedding"),
      "vec_id", "embedding", nCenters = 8, batchId = 0L)
    SemDedup.recenterSavedSemanticState(s, root, newNCenters = 16)
    SemDedup.newAgainstSavedSemantic(
      e.filter(col("vec_id") % 2 =!= 0).select("vec_id", "embedding"),
      root, "vec_id", "embedding", floor = 0.4, batchId = 1L,
      maxCluster = 100000)
  }

  /** Blocking-health triage of the saved semantic state: per-cluster
    * occupancy + corpus share from the state table alone — the
    * screen's quadratic-risk monitor (one runaway cluster is where
    * the per-batch probe blows up; a share far above 1/nCenters says
    * re-center). The fold into a fresh root IS the cost the stream
    * pays per kept batch, measured honestly like the other saved-
    * state queries. Hash-checked: the md5-frozen quantizer replays
    * exactly, counts are exact integers, the share division is
    * mirrored. */
  val reportSemanticOccupancy: Q = (s, dir) => {
    val e = Tables.embeddings(s, dir)
    val root = java.nio.file.Files
      .createTempDirectory("graft_sem_occ").toString + "/state"
    SemDedup.updateSavedSemanticState(root, e.select("vec_id", "embedding"),
      "vec_id", "embedding", nCenters = 16, batchId = 0L)
    SemDedup.savedSemanticOccupancy(s, root)
  }

  /** ExactSubstr duplicated-substring removal spans (Lee et al. 2022):
    * merged token regions covered by a non-first duplicated 5-gram —
    * the alignment-free pass that catches a copied passage at
    * DIFFERENT offsets, which the chunk-aligned [[dedupSpans]] windows
    * structurally miss. Hash-checked: first-occurrence order and the
    * interval union replay exactly in SQL. */
  val dedupSubstring: Q = (s, dir) =>
    Dedup.exactSubstrSpans(Tables.documents(s, dir), "doc_id", "text",
      minTokens = 5)

  /** [[dedupSubstring]]'s apply step: covered tokens drop, documents
    * reassemble — span-free docs pass through untouched. */
  val dedupSubstringApply: Q = (s, dir) =>
    Dedup.exactSubstrApply(Tables.documents(s, dir), "doc_id", "text",
      minTokens = 5)

  /** EXACT maximal duplicated substrings via prefix-doubling suffix
    * ranks (r13 VERDICT #1): all occurrences of every ≥5-token
    * substring occurring more than once, as merged per-doc regions —
    * the true suffix-array ExactSubstr, no L-gram materialization.
    * Hash-checked against the INDEPENDENT sliding-gram coverage
    * formulation (provably identical output — the coverage theorem in
    * [[graft.ext.SuffixDedup]]): two structurally different
    * algorithms must agree bit-for-bit. */
  val dedupSubstringExact: Q = (s, dir) =>
    graft.ext.SuffixDedup.duplicatedSpans(Tables.documents(s, dir),
      "doc_id", "text", minTokens = 5)

  /** [[dedupSubstringExact]]'s apply step: EVERY copy of duplicated
    * text drops (the released-dups policy — compare
    * [[dedupSubstringApply]]'s keep-first), documents reassemble. */
  val dedupSubstringExactApply: Q = (s, dir) =>
    graft.ext.SuffixDedup.duplicatedSpansApply(Tables.documents(s, dir),
      "doc_id", "text", minTokens = 5)

  /** Per-doc longest duplicated substring (length + earliest start) —
    * the suffix-array primitive surfaced as contamination triage:
    * "how much of this doc is verbatim from elsewhere, at its worst".
    * Engine = linear suffix-rank path; oracle = the independent
    * diagonal-run extension of aligned 5-gram pairs (exact by the
    * run↔maximal-match bijection in [[graft.ext.SuffixDedup
    * .longestMatch]]'s scaladoc) — the third member of the
    * cross-algorithm-verified suffix family. */
  val dedupLongestMatch: Q = (s, dir) =>
    graft.ext.SuffixDedup.longestMatch(Tables.documents(s, dir),
      "doc_id", "text", minTokens = 5)

  /** Per-language duplicated-token coverage — the corpus-health
    * rollup of the exact substring pass: how much of each language
    * slice is verbatim-duplicated text (all occurrences, ≥5-token
    * runs), how many docs carry any. The number a curation run reads
    * FIRST (a language at 40% duplicated text needs dedup before
    * anything else touches it). Hash-checked end to end: merged
    * spans are disjoint per doc, so the covered-token sum is exact
    * integer arithmetic + one mirrored share division. */
  val reportDupCoverage: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val perDoc = graft.ext.SuffixDedup
      .duplicatedSpans(docs, "doc_id", "text", minTokens = 5)
      .groupBy("doc_id").agg(sum(col("span_tokens")).as("__dup"))
    docs.select(col("doc_id"), col("lang"),
        size(graft.ext.TextOps.tokens(col("text"))).cast("long").as("__nt"))
      .join(perDoc, Seq("doc_id"), "left_outer")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_docs"),
        sum(col("__nt")).as("n_tokens"),
        coalesce(sum(col("__dup")), lit(0L)).as("n_dup_tokens"),
        count(when(col("__dup") > 0, 1)).as("n_docs_with_dups"))
      .withColumn("dup_share",
        round(col("n_dup_tokens") * 10000.0 / col("n_tokens")) / 1e4)
  }

  /** INCREMENTAL exact-substring screen (r15, r14 VERDICT #2): docs
    * `% 10 == 7` play the arriving micro-batch, the rest the
    * accumulated corpus; the batch's verbatim-duplicated spans (≥5
    * tokens, vs corpus ∪ batch) come from batch-internal suffix ranks
    * + one probe of the corpus gram index — the corpus is never
    * re-ranked. Hash-checked against the independent full-corpus
    * gram-coverage formulation restricted to batch docs: the equality
    * theorem on [[graft.ext.SuffixDedup.duplicatedSpansIncremental]]
    * says the two must agree bit-for-bit. */
  val dedupSubstringIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    graft.ext.SuffixDedup.duplicatedSpansIncremental(batch,
      graft.ext.SuffixDedup.gramIndex(corpus, "text", minTokens = 5,
        batchId = 0L),
      "doc_id", "text", minTokens = 5, batchId = 1L)
  }

  /** [[dedupSubstringIncremental]] over the saved BUCKETED index —
    * the production posture, oracle-gated end-to-end (r16 VERDICT
    * #2): the corpus gram index is BUILT as a bucketed external
    * table under a fresh root ([[graft.ext.SuffixDedup
    * .updateSavedGramIndexBucketed]] — the fold the ingest stream
    * pays per batch), then the batch probes it through the catalog
    * scan ([[graft.ext.SuffixDedup.savedGramIndexBucketed]], the
    * zero-Exchange-on-the-index-side plan PlanShapeSpec pins) and
    * must hash-match the SAME full-corpus coverage oracle as the
    * in-memory form. */
  val dedupSubstringIncrementalBucketed: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val root = java.nio.file.Files
      .createTempDirectory("graft_bkt_incr").toString + "/index"
    graft.ext.SuffixDedup.updateSavedGramIndexBucketed(root, corpus,
      "text", minTokens = 5, batchId = 0L)
    graft.ext.SuffixDedup.duplicatedSpansIncremental(batch,
      graft.ext.SuffixDedup.savedGramIndexBucketed(s, root),
      "doc_id", "text", minTokens = 5, batchId = 1L)
  }

  /** [[dedupSubstringIncremental]]'s apply step: the arriving batch's
    * verbatim-duplicated tokens (vs corpus ∪ batch) drop and the batch
    * docs reassemble — what the streaming curation composite actually
    * ships per micro-batch, hash-checked standalone: the oracle
    * replays the full-corpus coverage spans restricted to the batch
    * and applies the shared span-removal SQL over the batch spine. */
  val dedupSubstringIncrementalApply: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    graft.ext.SuffixDedup.duplicatedSpansIncrementalApply(batch,
      graft.ext.SuffixDedup.gramIndex(corpus, "text", minTokens = 5,
        batchId = 0L),
      "doc_id", "text", minTokens = 5, batchId = 1L)
  }

  /** Ingest-time benchmark screen (r16, r15 VERDICT #3): the even
    * train docs play the arriving micro-batch; the eval suite
    * (docs `% 20 == 0`) is a FROZEN gram index the batch probes —
    * the batch body of [[graft.streaming.CorpusStreams
    * .benchScreenStream]], which flags contamination at ingest
    * instead of curation time and never re-shards the suite.
    * Hash-checked against the independent gram-coverage replay
    * restricted to the batch slice (the cross-side coverage
    * theorem). */
  val decontamSubstringStream: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val batch = docs.filter(col("doc_id") % 20 =!= 0 && col("doc_id") % 2 === 0)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    graft.ext.Decontam.contaminatedSpansFromIndex(batch,
      graft.ext.SuffixDedup.gramIndex(bench, "text", minTokens = 5),
      "doc_id", "text", minTokens = 5)
  }

  /** Per-doc gram novelty (r16): the share of each doc's distinct
    * 5-grams occurring in NO other document — the "is this doc adding
    * anything" signal and doc-level memorization-risk triage,
    * replayed by an independent doc-frequency window in DuckDB. */
  val reportDocNovelty: Q = (s, dir) =>
    Dedup.gramNovelty(Tables.documents(s, dir), "doc_id", "text", n = 5)

  /** INCREMENTAL doc novelty from SAVED state (r16 VERDICT #3): docs
    * `% 10 == 7` play the arriving micro-batch; the rest of the
    * corpus's per-gram doc frequencies live in a saved BUCKETED
    * (g, doc_count, batch_id) index built under a fresh root — the
    * fold the novelty stream pays per batch — and the batch's novelty
    * comes from ONE probe of it, never a corpus rescan. Hash-checked
    * against the full-corpus doc-frequency replay restricted to the
    * batch (the equality theorem on
    * [[graft.ext.Dedup.gramNoveltyIncremental]]). */
  val reportDocNoveltyIncremental: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val corpus = docs.filter(col("doc_id") % 10 =!= 7)
    val batch = docs.filter(col("doc_id") % 10 === 7)
    val root = java.nio.file.Files
      .createTempDirectory("graft_df_incr").toString + "/dfidx"
    Dedup.updateSavedDfIndex(root, corpus, "doc_id", "text", n = 5,
      batchId = 0L)
    Dedup.gramNoveltyIncremental(batch,
      Dedup.savedDfIndexBucketed(s, root), "doc_id", "text", n = 5,
      batchId = 1L)
  }

  val aggDistinct: Q = (s, dir) =>
    Dedup.distinctPerGroup(Tables.events(s, dir), "event_type", "user_id")

  /** HLL++ approx distinct per group, CHECKED against the exact twin
    * in the same pass: the raw estimate is engine-specific (rows-only
    * forever), so the gate verifies the estimator's error bound
    * instead — `approx_ok` = |est − exact| ≤ 4·rsd·exact (rsd = 0.05
    * ⇒ the exact-integer form ·5). The oracle asserts TRUE; an
    * out-of-band estimate hash-fails the gate. Raw-estimate form:
    * [[Dedup.approxDistinctPerGroup]]. */
  val aggApproxDistinct: Q = (s, dir) =>
    Tables.events(s, dir)
      .groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n_exact"),
        approx_count_distinct(col("user_id"), 0.05).as("__est"))
      .select(col("event_type"), col("n_exact"),
        (abs(col("__est") - col("n_exact")) * 5 <= col("n_exact")).as("approx_ok"))


  /** This family's slice of [[Queries.all]]. */
  protected def dedupRegistry: Map[String, Q] = Map(
    "dedup_exact" -> dedupExact,
    "dedup_ngram" -> dedupNgram,
    "dedup_prefix_join" -> dedupPrefixJoin,
    "dedup_minhash_lsh" -> dedupMinhashLsh,
    "dedup_threshold_sweep" -> dedupThresholdSweep,
    "dedup_minhash_clusters" -> dedupMinhashClusters,
    "dedup_simhash" -> dedupSimhash,
    "dedup_winnowing" -> dedupWinnowing,
    "dedup_cdc" -> dedupCdc,
    "dedup_substring" -> dedupSubstring,
    "dedup_substring_apply" -> dedupSubstringApply,
    "dedup_substring_exact" -> dedupSubstringExact,
    "dedup_substring_exact_apply" -> dedupSubstringExactApply,
    "dedup_longest_match" -> dedupLongestMatch,
    "dedup_substring_incremental" -> dedupSubstringIncremental,
    "dedup_substring_incremental_bucketed" -> dedupSubstringIncrementalBucketed,
    "dedup_substring_incremental_apply" -> dedupSubstringIncrementalApply,
    "report_dup_coverage" -> reportDupCoverage,
    "report_doc_novelty" -> reportDocNovelty,
    "report_doc_novelty_incremental" -> reportDocNoveltyIncremental,
    "dedup_embedding" -> dedupEmbedding,
    "dedup_semantic" -> dedupSemantic,
    "split_leakage" -> splitLeakage,
    "split_repair" -> splitRepair,
    "dedup_components" -> dedupComponents,
    "decontam_overlap" -> decontamOverlap,
    "decontam_spans" -> decontamSpans,
    "decontam_substring_exact" -> decontamSubstringExact,
    "decontam_longest_bench" -> decontamLongestBench,
    "report_bench_contamination" -> reportBenchContamination,
    "decontam_spans_clean" -> decontamSpansClean,
    "decontam_substring_stream" -> decontamSubstringStream,
    "decontam_bloom" -> decontamBloom,
    "decontam_semantic" -> decontamSemantic,
    "split_assign" -> splitAssign,
    "agg_distinct" -> aggDistinct,
    "agg_approx_distinct" -> aggApproxDistinct,
    "dedup_incremental" -> dedupIncremental,
    "dedup_incremental_near" -> dedupIncrementalNear,
    "dedup_incremental_near_saved" -> dedupIncrementalNearSaved,
    "dedup_incremental_semantic" -> dedupIncrementalSemantic,
    "dedup_incremental_semantic_saved" -> dedupIncrementalSemanticSaved,
    "dedup_semantic_recenter" -> dedupSemanticRecenter,
    "report_semantic_occupancy" -> reportSemanticOccupancy,
    "curate_corpus_mix" -> curateCorpusMix)
}
