package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** End-to-end curation funnels and shared-stage composites. */
trait CompositeQueries extends QueriesBase {

  // ================================================ [EXT] composite

  /** The flagship curation composite: the end-to-end corpus-prep job
    * every piece above exists for — quality gate → exact-dedup keep-set
    * → benchmark decontamination → stable split assignment — composed
    * into ONE declarative plan Catalyst optimizes end to end (filter
    * pushdown through all four stages; both membership checks are
    * broadcast anti/semi joins; the corpus is scanned, never shuffled
    * whole). */
  val curateCorpus: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val scored = TextOps.qualityScore(TextOps.qualitySignals(train))
      .filter(col("quality_score") >= 0.5)
      .select("doc_id", "text", "quality_score")
    val keep = Dedup.exactGroups(scored, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = scored.join(keep, Seq("doc_id"), "left_semi")
    val cleaned = Decontam.clean(deduped, bench, "doc_id", "text", n = 5)
    Splits.assign(cleaned, "doc_id", Seq("train" -> 90, "val" -> 10), salt = "graft")
      .select("doc_id", "quality_score", "split")
  }

  /** The curation funnel with the TRAINED gate (r12): the
    * model-based classifier tier real stacks run after heuristics —
    * classifier trained once on the raw corpus's doc_id%3 labeled
    * slice ([[TextQueries.qualityClassifier]]'s model), candidate
    * docs gated on its NB log-odds keep, then the standard tail:
    * exact first-occurrence dedup → 5-gram decontamination against
    * the bench slice → stable split assignment. The gated+scored
    * frame feeds three consumers, so it takes the one persist
    * boundary ([[curateCorpusNear]]'s pattern). */
  val curateCorpusClassified: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val index = TextOps.qualityClassifierIndex(
      docs.filter(col("doc_id") % 3 === 0)
        .withColumn("__label", col("lang") === "en"),
      "__label")
    val gated = TextOps.screenQualityClassifier(train, index)
      .filter(col("keep"))
      .join(train.select("doc_id", "text"), Seq("doc_id"))
      .select(col("doc_id"), col("text"), col("score"))
      .localCheckpoint()
    val keep = Dedup.exactGroups(gated, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = gated.join(keep, Seq("doc_id"), "left_semi")
    val cleaned = Decontam.clean(deduped, bench, "doc_id", "text", n = 5)
    Splits.assign(cleaned, "doc_id", Seq("train" -> 90, "val" -> 10),
        salt = "graft")
      .select("doc_id", "score", "split")
  }

  /** The curation composite with NEAR-dup dedup: same four stages as
    * [[curateCorpus]] but the keep-set comes from MinHash cluster
    * representatives (doc == cluster) instead of exact-hash groups —
    * the form recommended at 100 TB, where duplicate groups are deep
    * and pair enumeration is quadratic. Hash-checked end to end: the
    * portable hash family lets the oracle replay the cluster keep-set
    * exactly, and near-dedup can only remove MORE rows than exact
    * (spec-pinned). */
  val curateCorpusNear: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    // stage-boundary materialization: the gated+scored corpus feeds
    // FOUR consumers (cluster keep-set, semi-join, decontam stats,
    // decontam anti-join) — without it the scan + quality regexes
    // re-run per consumer. The exact composite (curate_corpus) stays
    // single-plan to demonstrate end-to-end Catalyst optimization;
    // this near form is the 100 TB shape, and at 100 TB this is the
    // persist-once boundary every real pipeline puts after its gate
    // (persist(DISK_ONLY) on a cluster).
    val scored = TextOps.qualityScore(TextOps.qualitySignals(train))
      .filter(col("quality_score") >= 0.5)
      .select("doc_id", "text", "quality_score")
      .localCheckpoint()
    val keep = Dedup.minhashClusters(scored, "doc_id", "text")
      .filter(col("doc") === col("cluster"))
      .select(col("doc").as("doc_id"))
    val deduped = scored.join(keep, Seq("doc_id"), "left_semi")
    val cleaned = Decontam.clean(deduped, bench, "doc_id", "text", n = 5)
    Splits.assign(cleaned, "doc_id", Seq("train" -> 90, "val" -> 10), salt = "graft")
      .select("doc_id", "quality_score", "split")
  }

  /** The curation composite gated by the published Gopher rule battery
    * instead of the linear quality score: gopher-keep filter (one
    * codegen'd scan, exact-integer gates) → exact dedup → benchmark
    * decontamination → stable split. The filter-first order is the
    * 100 TB shape: the cheapest gate runs against the raw scan and
    * every later stage sees only survivors. */
  val curateCorpusGopher: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val kept = train.filter(TextOps.gopherKeep(col("text")))
      .withColumn("n_words", size(TextOps.tokens(col("text"))).cast("long"))
      .select("doc_id", "text", "n_words")
    val keep = Dedup.exactGroups(kept, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = kept.join(keep, Seq("doc_id"), "left_semi")
    val cleaned = Decontam.clean(deduped, bench, "doc_id", "text", n = 5)
    Splits.assign(cleaned, "doc_id", Seq("train" -> 90, "val" -> 10), salt = "graft")
      .select("doc_id", "n_words", "split")
  }

  /** The multilingual-mix funnel: Gopher quality gate → exact
    * first-occurrence dedup → TEMPERATURE mixture over the survivors
    * (α=½ by lang, Σ n_copies = 500 exactly) — the mC4/XLM-R assembly
    * DAG, with the mixture computed over the CURATED counts (running
    * it on the raw corpus would weight languages by their spam). */
  val curateCorpusTemperature: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val kept = docs.filter(TextOps.gopherKeep(col("text")))
      .select("doc_id", "lang", "text")
    val keep = Dedup.exactGroups(kept, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = kept.join(keep, Seq("doc_id"), "left_semi")
      .select("doc_id", "lang")
    Sampling.temperatureResample(deduped, "doc_id", "lang",
      totalOut = 500L, salt = "curate")
  }

  /** Context-window chunking of documents: 32-token chunks overlapping
    * by 8 — zero-shuffle per-row explode (see [[ext.Chunking]]). */
  val textChunk: Q = (s, dir) =>
    ext.Chunking.chunkByTokens(Tables.documents(s, dir)
      .select("doc_id", "text"), "doc_id", "text", chunkSize = 32, overlap = 8)

  /** Per-event-type distribution drift of `value` vs the whole corpus:
    * exact χ² over the agg_histogram bucket law (coarser buckets so
    * every type has populated cells). */
  val driftChisq: Q = (s, dir) =>
    Profile.driftChiSquare(Tables.events(s, dir), "event_type", col("value"),
      lo = 0.0, hi = 500.0, nBuckets = 10)

  /** Min–max feature scaling per event type — same shape as
    * scalar_zscore, range-normalized instead of standardized. */
  val scalarMinmax: Q = (s, dir) =>
    Profile.minmaxScale(
      Tables.events(s, dir).select("event_id", "event_type", "value"),
      Seq("event_type"), "value")

  /** Curation-funnel report over documents: ordered quality gates,
    * entry/survivor counts per stage in one scan. */
  val qualityFunnel: Q = (s, dir) =>
    Profile.filterFunnel(Tables.documents(s, dir), Seq(
      "min_chars" -> (col("n_chars") >= 150),
      "english" -> (col("lang") === "en"),
      "max_chars" -> (col("n_chars") <= 450),
      "source_ok" -> (col("source") =!= "src3")))

  /** PER-DOC funnel drop attribution (r15, r14 VERDICT #4): the first
    * thing a curation operator asks when a batch shrinks — WHICH stage
    * dropped each document. One row per train doc with the FIRST
    * failing stage of [[curateCorpus]]'s battery: `quality`
    * (score < 0.5), `dedup` (lost to the exact-hash canonical), or
    * `decontam` (≥1 shared 5-gram with the bench slice) — survivors
    * read `kept`. Aggregating `stage` reconciles exactly with the
    * composite's per-stage survivor counts (spec-pinned), and
    * `count(stage = 'kept')` IS `curate_corpus`'s row count.
    *
    * Plan shape: the same scans the funnel itself pays — the scored
    * gate frame materializes once and feeds the gate flag, the
    * keep-set groupBy, and the decontam probe; the keep/contaminated
    * memberships come back as two left joins (broadcast when they
    * fit), and the when-chain is one codegen'd projection. No extra
    * corpus scans. */
  val curateCorpusAudit: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val train = docs.filter(col("doc_id") % 20 =!= 0)
    val scored = TextOps.qualityScore(TextOps.qualitySignals(train))
      .select(col("doc_id"), col("text"), col("quality_score"))
      .localCheckpoint()
    val passed = scored.filter(col("quality_score") >= 0.5)
    val keep = Dedup.exactGroups(passed, "doc_id", "text")
      .select(col("keep_id").as("doc_id"), lit(true).as("__keeper"))
    val contaminated = Decontam
      .overlapStats(passed, bench, "doc_id", "text", n = 5)
      .filter(col("n_overlap") >= 1)
      .select(col("doc_id"), lit(true).as("__hit"))
    scored
      .join(keep, Seq("doc_id"), "left_outer")
      .join(contaminated, Seq("doc_id"), "left_outer")
      .select(col("doc_id"), col("quality_score"),
        when(col("quality_score") < 0.5, "quality")
          .when(col("__keeper").isNull, "dedup")
          .when(col("__hit").isNotNull, "decontam")
          .otherwise("kept").as("stage"))
  }

  /** Corpus re-weighting to a 4:3:2:1:1 source mixture — unlisted
    * sources drop, the bottleneck source keeps 100%, everything else
    * down-samples on the stable md5 bucket. */
  val sampleMixture: Q = (s, dir) =>
    Sampling.mixtureResample(
      Tables.documents(s, dir).select("doc_id", "source"),
      "doc_id", "source",
      Seq("src0" -> 4, "src1" -> 3, "src2" -> 2, "src3" -> 1, "src4" -> 1),
      salt = "mix")

  /** Temperature-resampled language mixture (mC4/XLM-R, α = ½): 1000
    * output epochs apportioned ∝ √n_lang by exact largest remainder —
    * at the 500-doc SFs rare languages repeat (n_copies ≥ 2, the
    * upsampling regime); at sf0.1's 5000 docs every quota sits under
    * its stratum (the downsampling regime), so the gate exercises
    * both. Σ n_copies = 1000 exactly at every SF. */
  val sampleTemperature: Q = (s, dir) =>
    Sampling.temperatureResample(
      Tables.documents(s, dir).select("doc_id", "lang"),
      "doc_id", "lang", totalOut = 1000L, alphaQuarters = 2, salt = "temp")

  /** Token-budgeted mixture: each source fills its token quota in md5
    * order — the tokens-not-documents form of mix assembly (see
    * [[Sampling.tokenBudgetSample]]; full audit report, kept flag per
    * doc). */
  val sampleTokenBudget: Q = (s, dir) =>
    Sampling.tokenBudgetSample(
      Tables.documents(s, dir).select("doc_id", "source", "text"),
      "doc_id", "source", TextOps.tokenCount(col("text")),
      budgets = Seq("src0" -> 2000L, "src1" -> 500L),
      defaultBudget = 1000L, salt = "graft")

  /** The curation funnel with EXACT substring dedup as its scrub
    * stage: gopher gate → suffix-rank duplicated-span removal (ALL
    * occurrences of every ≥5-token duplicated run drop, the
    * released-dups policy) → survivors with ≥30 remaining tokens →
    * stable split. The funnel form of Lee et al. 2022's headline
    * result — dedup the TEXT, not just the documents: a doc that
    * shares half its body with the corpus keeps its unique half.
    * Fully hash-checked: gate, span removal (via the coverage-theorem
    * gram replay), the post-dedup length gate and the md5 split all
    * replay in one oracle statement. */
  val curateCorpusSubstring: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // stage boundary: the gated corpus feeds the suffix pipeline's
    // several consumers (persist(DISK_ONLY) on a cluster)
    val kept = docs.filter(TextOps.gopherKeep(col("text")))
      .select("doc_id", "text").localCheckpoint()
    val applied = graft.ext.SuffixDedup
      .duplicatedSpansApply(kept, "doc_id", "text", minTokens = 5)
    val survivors = applied
      .filter(col("n_tokens") - col("n_removed") >= 30)
    Splits.assign(survivors, "doc_id", Seq("train" -> 90, "val" -> 10),
        salt = "graft")
      .select("doc_id", "n_tokens", "n_removed", "split")
  }

  /** The INGEST-time curation funnel (r16 — the batch body of the
    * streaming posture [[graft.streaming.CorpusStreams
    * .benchScreenStream]] + span removal): the even train docs play
    * the arriving micro-batch, the eval suite (docs `% 20 == 0`) is a
    * FROZEN gram index. Gopher gate → within-batch exact-dedup
    * keep-set → SURGICAL bench decontamination (span removal via one
    * probe of the frozen index — [[Decontam
    * .contaminatedSpansFromIndex]], not the whole-doc drop) →
    * ≥30-kept-token floor. Where [[curateCorpus]] drops a leaking doc
    * outright, this funnel excises exactly the leaked windows and
    * keeps the rest — the released-dups posture applied at ingest. */
  val curateCorpusIngest: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val bench = docs.filter(col("doc_id") % 20 === 0)
    val batch = docs.filter(col("doc_id") % 20 =!= 0 &&
      col("doc_id") % 2 === 0)
    // stage boundary: the gated batch feeds the keep-set, the probe,
    // and the reassembly (persist(DISK_ONLY) on a cluster)
    val gated = batch.filter(TextOps.gopherKeep(col("text")))
      .select("doc_id", "text").localCheckpoint()
    val keep = Dedup.exactGroups(gated, "doc_id", "text")
      .select(col("keep_id").as("doc_id"))
    val deduped = gated.join(keep, Seq("doc_id"), "left_semi")
    Decontam.cleanSpansFromIndex(deduped,
        graft.ext.SuffixDedup.gramIndex(bench, "text", minTokens = 5),
        "doc_id", "text", minTokens = 5)
      .filter(col("n_tokens") - col("n_removed") >= 30)
  }

  /** Weighted systematic sample: exactly 20 draws per language with
    * inclusion ∝ token count — "sample by data volume, not doc
    * count", in exact integer threshold arithmetic (see
    * [[Sampling.weightedSystematic]]; full audit report, n_copies
    * per doc, Σ = 20 per lang). */
  val sampleWeightedSystematic: Q = (s, dir) =>
    Sampling.weightedSystematic(
      Tables.documents(s, dir).select("doc_id", "lang", "text"),
      "doc_id", "lang", TextOps.tokenCount(col("text")),
      n = 20, salt = "wsys")
      .select("doc_id", "lang", "weight", "cum_before", "n_copies")

  /** Quality-aware canonical selection: for each near-dup cluster from
    * the n-gram pair graph, keep the LONGEST member (doc id tiebreak) —
    * the doc a curation pipeline would actually retain, vs the
    * arbitrary min-id label of dedup_components. Exact recursive-CTE
    * closure + window oracle. */
  val dedupCanonical: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val labels = graft.operators.ConnectedComponents.run(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 50),
      "id_a", "id_b")
    Dedup.canonicalPerCluster(labels,
      docs.select("doc_id", "n_chars"), "doc_id", prefer = Seq("n_chars"))
  }

  /** The pair graph and its connected components computed ONCE,
    * serving both consumers: per-doc cluster labels (the
    * dedup_components shape) AND the per-cluster canonical choice —
    * one (doc_id, label, canonical_doc_id) row per clustered doc.
    * [[dedupComponents]] + [[dedupCanonical]] run standalone recompute
    * the pair join + closure twice; here the label frame — already
    * materialized by `ConnectedComponents.run`'s per-round
    * `localCheckpoint` (a cluster deployment would persist to disk) —
    * is re-read by the window and the join, so the expensive Σ bucket²
    * candidate work happens exactly once. */
  val dedupCanonicalShared: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    val labels = graft.operators.ConnectedComponents.run(
      Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        n = 3, threshold = 0.5, maxDocFreq = 50),
      "id_a", "id_b")
    val canon = Dedup.canonicalPerCluster(labels,
      docs.select("doc_id", "n_chars"), "doc_id", prefer = Seq("n_chars"))
    labels.withColumnRenamed("node", "doc_id")
      .join(canon.select("cluster", "canonical_doc_id"),
        col("label") === col("cluster"))
      .select("doc_id", "label", "canonical_doc_id")
  }

  /** Unicode canonicalization of every document: NFC + accent-strip +
    * lower/trim/whitespace-collapse — the cross-crawl fingerprint key
    * (composed vs decomposed crawls of the same page canonicalize
    * identically). Codegen'd with an ASCII fast path. */
  val textNormalize: Q = (s, dir) =>
    Tables.documents(s, dir)
      .select(col("doc_id"), TextOps.normalizeText(col("text")).as("canon"))

  /** Ordered view→click→purchase funnel over the event stream:
    * entities must hit each step strictly later than the previous
    * step's first qualifying time. */
  val eventsFunnel: Q = (s, dir) =>
    SeriesOps.sequenceFunnel(
      Tables.events(s, dir).select("user_id", "event_type", "ts"),
      "user_id", "event_type", "ts", Seq("view", "click", "purchase"))

  /** Monthly cohort retention over the event stream: users cohorted by
    * first active month, cells count distinct users active at each
    * month offset (see [[SeriesOps.cohortRetention]]). */
  val eventsRetention: Q = (s, dir) =>
    SeriesOps.cohortRetention(Tables.events(s, dir), "user_id", "ts")

  /** Community-aware canonical selection on the near-dup graph (r13
    * VERDICT #6): gopher gate → MinHash-LSH verified pair graph →
    * fixed-round label-propagation COMMUNITIES → one canonical doc per
    * community. Connected components over-merge near-dup neighborhoods
    * through weak transitive links (A~B, B~C keeps only one of A,C even
    * when jaccard(A,C) ≈ 0); LPA splits a chained component at its
    * sparse cuts, so each densely-linked region keeps its own
    * representative. Output: one row per KEPT doc — (doc_id, community,
    * n_members), isolated gated docs (no verified pair) as their own
    * 1-member community.
    *
    * Scale shape: gate runs against the raw scan; pairs come from the
    * bucketed band join (maxBucket=200 hot-bucket guard, Σ bucket²
    * never N²); LPA is 5 synchronous rounds of two linear shuffles
    * over a once-checkpointed adjacency; canonical-select is ONE
    * map-side-combinable (min ‖ count) aggregate per community — the
    * same agg-beats-window choice the LPA winner step makes, where a
    * row_number window would shuffle-sort every member row. */
  val curateCorpusCommunities: Q = (s, dir) => {
    val docs = Tables.documents(s, dir)
    // stage boundary: the gated corpus feeds the pair generator AND
    // the isolated-doc anti-join (persist(DISK_ONLY) on a cluster)
    val kept = docs.filter(TextOps.gopherKeep(col("text")))
      .select("doc_id", "text").localCheckpoint()
    val pairs = Dedup.minhashLshPairs(kept, "doc_id", "text", maxBucket = 200)
      .select("id_a", "id_b")
    val comm = graft.operators.LabelPropagation.run(
      pairs, "id_a", "id_b", iterations = 5)
    val canon = comm.groupBy("community")
      .agg(min(col("node")).as("doc_id"), count(lit(1)).as("n_members"))
      .select("doc_id", "community", "n_members")
    val isolated = kept.select("doc_id")
      .join(comm.select(col("node").as("doc_id")), Seq("doc_id"), "left_anti")
      .select(col("doc_id"), col("doc_id").as("community"),
        lit(1L).as("n_members"))
    canon.unionByName(isolated)
  }

  /** Weekly cohort retention (r10 ADVICE #2): the fixtures' events
    * span one calendar month, so the MONTHLY matrix collapses to
    * offset-0 cells and the offset arithmetic never meets the oracle;
    * weekly granularity puts offsets 1..4 and sub-1.0 normalization
    * under the cross-engine hash gate at every SF. */
  val eventsRetentionWeekly: Q = (s, dir) =>
    SeriesOps.cohortRetentionBy(Tables.events(s, dir), "user_id", "ts", "week")


  /** This family's slice of [[Queries.all]]. */
  protected def compositeRegistry: Map[String, Q] = Map(
    "curate_corpus" -> curateCorpus,
    "curate_corpus_near" -> curateCorpusNear,
    "curate_corpus_classified" -> curateCorpusClassified,
    "text_chunk" -> textChunk,
    "drift_chisq" -> driftChisq,
    "scalar_minmax" -> scalarMinmax,
    "quality_funnel" -> qualityFunnel,
    "curate_corpus_audit" -> curateCorpusAudit,
    "sample_mixture" -> sampleMixture,
    "sample_temperature" -> sampleTemperature,
    "sample_token_budget" -> sampleTokenBudget,
    "sample_weighted_systematic" -> sampleWeightedSystematic,
    "dedup_canonical" -> dedupCanonical,
    "dedup_canonical_shared" -> dedupCanonicalShared,
    "text_normalize" -> textNormalize,
    "events_funnel" -> eventsFunnel,
    "events_retention" -> eventsRetention,
    "curate_corpus_gopher" -> curateCorpusGopher,
    "curate_corpus_temperature" -> curateCorpusTemperature,
    "curate_corpus_communities" -> curateCorpusCommunities,
    "curate_corpus_substring" -> curateCorpusSubstring,
    "curate_corpus_ingest" -> curateCorpusIngest,
    "events_retention_weekly" -> eventsRetentionWeekly)
}
