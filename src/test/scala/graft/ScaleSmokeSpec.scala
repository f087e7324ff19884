package graft

import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.ext.Dedup

/** Opt-in scale smoke (set GRAFT_SCALE_SMOKE=1): runs the candidate-
  * generating dedup operators over a 100k-doc corpus (200× sf0.01) to
  * catch quadratic blowups the small fixtures can't see — the class of
  * regression that took winnowing containment from 3 s to 40 s when
  * gram length let boilerplate fingerprints form giant buckets.
  * Thresholds are generous (CI machine noise); the failure mode being
  * guarded is minutes-vs-seconds, not percent.
  */
class ScaleSmokeSpec extends SparkSpec {

  private val enabled = sys.env.contains("GRAFT_SCALE_SMOKE")

  private def smokeTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  // 100k docs: 500 base docs × 200 near-copies (unique tails) —
  // realistic shingle-frequency skew with 200-deep duplicate groups.
  // The cache is materialized HERE (count inside the lazy val) so no
  // test bills corpus construction to its timed window.
  private lazy val (corpus, corpusSize) = {
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val c = (0 until 200).map { rep =>
      base.withColumn("doc_id", col("doc_id") + lit(rep * 1000000L))
        .withColumn("text",
          concat(col("text"), lit(s" unique tail $rep variant "),
            (col("doc_id") % 97).cast("string")))
    }.reduce(_.unionByName(_)).repartition(8).cache()
    (c, c.count())
  }

  smokeTest("minhash cluster dedup is linear-output at 100k docs with 200-dup groups") {
    // pair enumeration is the wrong operator here by construction:
    // 200-copy groups → C(200,2) pairs each (measured 10.9M pairs,
    // 6 min). The cluster form must emit one row per doc and finish
    // in well under a minute.
    val total = corpusSize
    val t0 = System.nanoTime()
    val clusters = Dedup.minhashClusters(corpus, "doc_id", "text").cache()
    val nRows = clusters.count()
    val nClusters = clusters.select("cluster").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"cluster dedup: $nRows rows, $nClusters clusters in ${secs.round} s")
    assert(nRows == total, "must emit exactly one row per doc")
    assert(nClusters < total / 50, "200-dup groups must collapse")
    assert(secs < 120, s"cluster dedup blew up: $secs s")
  }

  smokeTest("winnowing containment stays sub-quadratic at 100k docs") {
    corpusSize // force corpus
    val t0 = System.nanoTime()
    val n = Dedup.winnowingContainmentPairs(corpus, "doc_id", "text",
      threshold = 0.8).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"winnowing: $n pairs in ${secs.round} s")
    assert(secs < 300, s"winnowing blew up: $secs s")
  }

  smokeTest("ngram Jaccard with doc-frequency cap stays sub-quadratic at 100k docs") {
    // every base-text shingle recurs in 200 near-copies (df=200 > 50):
    // uncapped, each contributes 200² ≈ 40k join rows × ~300 shingles
    // × 500 groups — the quadratic blowup. The cap drops them up front;
    // only the low-frequency tail shingles join.
    corpusSize
    val t0 = System.nanoTime()
    val n = Dedup.ngramJaccardPairs(corpus, "doc_id", "text",
      n = 3, threshold = 0.8, maxDocFreq = 50).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"ngram capped: $n pairs in ${secs.round} s")
    assert(secs < 180, s"ngram dedup blew up: $secs s")
  }

  smokeTest("decontamination probes 100k docs against a broadcast benchmark in one pass") {
    // bench = the 500 base docs; every replica shares shingles with it,
    // so the probe matches ~everything — worst case for the join side
    corpusSize
    val bench = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val n = graft.ext.Decontam.overlapStats(corpus, bench, "doc_id", "text").count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"decontam: $n flagged docs in ${secs.round} s")
    assert(n == corpusSize, "every near-copy must be flagged")
    assert(secs < 120, s"decontam blew up: $secs s")
  }

  smokeTest("minhash LSH pairs with maxBucket guard stay bounded at 100k docs") {
    // 200-deep dup groups fill every band bucket: the pair form's
    // C(200,2)-per-group degeneracy. maxBucket=50 skips those buckets
    // (the cluster form owns deep groups); what remains must run in
    // seconds now that the banded shuffle carries keys only — the r3
    // form shuffled each doc's full shingle array bands=16×.
    corpusSize
    val t0 = System.nanoTime()
    val n = Dedup.minhashLshPairs(corpus, "doc_id", "text",
      verifyThreshold = 0.8, maxBucket = 50).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"lsh pairs (capped): $n pairs in ${secs.round} s")
    assert(secs < 180, s"LSH pair dedup blew up: $secs s")
  }

  smokeTest("edit-distance dedup with maxBucket guard stays bounded at 100k docs") {
    // every base doc's 200 replicas share its 16-byte canonical prefix:
    // unguarded, each prefix bucket holds 200+ docs → ~C(200,2)·500 ≈
    // 10M levenshtein candidates. maxBucket=50 drops boilerplate
    // buckets up front (the documented mitigation); the remainder must
    // run in seconds.
    corpusSize
    val t0 = System.nanoTime()
    val n = Dedup.editDistancePairs(corpus, "doc_id", "text",
      maxDist = 8, maxBucket = 50).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"editdist (capped): $n pairs in ${secs.round} s")
    assert(secs < 120, s"edit-distance dedup blew up: $secs s")
  }

  smokeTest("tf-idf and vocab overlap stay linear at 100k docs") {
    // tf-idf: one token-stream shuffle + vocab-sized df join; overlap:
    // per-token buckets are ≤ |groups| after the distinct — both must
    // scale with tokens, not docs², on the replicated corpus.
    corpusSize
    val withSrc = corpus.withColumn("src",
      (col("doc_id") % 20).cast("string"))
    val t0 = System.nanoTime()
    val nTfidf = graft.ext.TextOps.tfidfTopK(corpus, "doc_id", "text", k = 3,
      logIdf = false).count()
    val nOverlap = graft.ext.TextOps.vocabOverlap(withSrc, "src", "text").count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"tfidf($nTfidf rows) + overlap($nOverlap pairs) in ${secs.round} s")
    assert(nTfidf >= 100000 * 1L, "k=3 rows per doc with ≥1 token")
    assert(nOverlap == 20 * 19 / 2, "all source pairs overlap on this corpus")
    assert(secs < 180, s"text analytics blew up: $secs s")
  }

  smokeTest("profiling aggregates scan 10M rows in single-shuffle plans") {
    // events sf0.1 × 100 = 10M rows: the profiling family must stay a
    // single map-side-combined shuffle each — histogram buckets,
    // DECIMAL power-sum moments, correlation. (Medians/winsorize are
    // documented holistic — excluded; their scale path is
    // approx_percentile.)
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select(col("event_type"), col("value"), dayofmonth(col("ts")).cast("double").as("d"))
    val big = (0 until 100).map(i => ev.withColumn("value", col("value") + i * 0.01))
      .reduce(_.unionByName(_)).repartition(16).cache()
    val total = big.count()
    assert(total == 10000000L)
    val t0 = System.nanoTime()
    val h = graft.ext.Profile.histogram(big, Seq("event_type"), col("value"),
      0.0, 600.0, 60).count()
    val m = graft.ext.Profile.moments(big, Seq("event_type"), col("value")).count()
    val c = graft.ext.Profile.pearsonCorr(big, Seq("event_type"),
      col("value"), col("d")).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"10M-row histogram($h)+moments($m)+corr($c) in ${secs.round} s")
    assert(m == 5 && c == 5)
    assert(secs < 120, s"profiling scan blew up: $secs s")
    big.unpersist()
  }

  smokeTest("heavy hitters: 10M rows / 1M distinct keys shuffle only the summaries") {
    // Zipf-ish stream: 10 hot keys carry ~55% of 10M rows over a 1M-key
    // tail. The exact groupBy alternative shuffles 1M distinct rows; the
    // two-pass sketch shuffles ≤ partitions·(k+1) summary rows and a
    // broadcast candidate set — the shape that holds when the key space
    // is billions of URLs/tokens.
    val big = spark.range(10000000L)
      .select(when(col("id") % 100 < 55, concat(lit("hot"), col("id") % 10))
        .otherwise(concat(lit("k"), col("id") % 1000000)).as("word"))
      .repartition(16).cache()
    assert(big.count() == 10000000L)
    val t0 = System.nanoTime()
    val out = graft.ext.HeavyHitters.heavyHitters(big, "word", k = 30)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"10M-row/1M-key heavy hitters (${out.length} found) in ${secs.round} s")
    // every hot key clears n/31 ≈ 3.2% (each carries ~5.5%); the 1M
    // cold keys (~10 rows each) must all be filtered out
    assert(out.length == 10 && out.forall(_.getString(0).startsWith("hot")))
    val summary = graft.ext.HeavyHitters.summarize(big, "word", 30)
    assert(summary.count() <= 16L * 31,
      "summary frame must stay bounded by partitions·(k+1)")
    assert(secs < 120, s"heavy hitters blew up: $secs s")
    big.unpersist()
  }

  smokeTest("context-window chunking stays linear (zero-shuffle) at 100k docs") {
    corpusSize
    val t0 = System.nanoTime()
    val n = graft.ext.Chunking
      .chunkByTokens(corpus, "doc_id", "text", chunkSize = 32, overlap = 8)
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"chunking: $n chunks in ${secs.round} s")
    assert(n >= 100000L, "every doc must yield at least one chunk")
    assert(secs < 60, s"chunking blew up: $secs s")
  }

  smokeTest("simhash combination banding stays sub-quadratic at 100k docs") {
    // pieces=6 ⇒ 20 tables keyed on ~32 bits: random-hash buckets are
    // ≈ N/2³² ≪ 1; only true near-dup groups form buckets.
    corpusSize
    val t0 = System.nanoTime()
    val n = Dedup.simhashPairs(corpus, "doc_id", "text", maxHamming = 3).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"simhash: $n pairs in ${secs.round} s")
    assert(secs < 300, s"simhash blew up: $secs s")
  }

  smokeTest("bloom decontam probes 100k docs against a bitset in one broadcast pass") {
    corpusSize
    val bench = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .filter(col("doc_id") % 20 === 0).select(col("doc_id"), col("text"))
    val t0 = System.nanoTime()
    val flagged = graft.ext.Decontam.overlapStatsBloom(corpus, bench,
      "doc_id", "text", n = 5, mBits = 1 << 20, kProbes = 4).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"bloom decontam: $flagged flagged docs in ${secs.round} s")
    // every near-copy of a benchmark base doc shares its 5-grams
    assert(flagged >= 200L, "benchmark overlaps must surface")
    assert(secs < 120, s"bloom decontam blew up: $secs s")
  }

  smokeTest("z-order layout stats scan 10M rows in bounded-output aggregations") {
    val ev = graft.Tables.events(spark, "/root/testdata/sf0.1")
      .select("user_id", "value")
    val big = (0 until 100).map(i => ev.withColumn("value", col("value") + i * 0.01))
      .reduce(_.unionByName(_)).repartition(16)
      .withColumn("value_i", floor(col("value")).cast("long")).cache()
    val total = big.count()
    val t0 = System.nanoTime()
    val stats = graft.operators.ZOrder.rangeStats(big, "user_id", "value_i",
      bits = 8, nBuckets = 32).collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"z-order stats over $total rows: ${stats.length} buckets in ${secs.round} s")
    assert(stats.map(_.getAs[Long]("n_rows")).sum == total)
    assert(secs < 120, s"z-order stats blew up: $secs s")
    big.unpersist()
  }

  smokeTest("salted join on a zipf-hot key: partition balance proven, timing documented") {
    // zipf-ish fixture the driver data lacks (its keys are uniform):
    // 2M left rows with 80% on one hot key, a 1001-key right side
    // forced past the broadcast path — the exact regime saltedJoin
    // exists for.
    //
    // MEASURED CROSSOVER (this host, local[2]): the salted plan's
    // partition balance is decisively better (max reduce share 0.91 →
    // 0.52) but wall-clock is ~0.8× plain — at 2 cores the theoretical
    // balance ceiling (2×) barely exceeds the salting overhead (extra
    // hash + wider keys + salts× right replication). The win scales
    // with executor count (1000 executors: hot task 0.91·N vs
    // balanced N/1000), which is why the BALANCE assertion below is
    // the contract and the timing is documentation.
    import spark.implicits._
    val salts = 32
    val left = spark.range(2000000L).select(col("id"),
        when(col("id") % 10 < 8, 0L).otherwise(pmod(col("id"), lit(1000)) + 1)
          .as("k"),
        (col("id") % 100).as("v"))
      .repartition(8).cache()
    val right = spark.range(0L, 1001L)
      .select(col("id").as("k"), (col("id") * 7).as("payload")).cache()
    val total = left.count(); right.count()

    // (a) the MECHANISM, deterministically: share of the biggest
    // shuffle partition under the plain key vs the salted key. The
    // hot key pins ≥ its own 30% (plus ~half the rest) to one of the
    // two test reducers; salting spreads it to ~50/50.
    val parts = spark.conf.get("spark.sql.shuffle.partitions").toInt
    def maxShare(key: org.apache.spark.sql.Column): Double = {
      val counts = left.groupBy(pmod(hash(key), lit(parts)).as("p"))
        .count().select("count").as[Long].collect()
      counts.max.toDouble / total
    }
    val plainShare = maxShare(col("k"))
    val saltedShare = maxShare(struct(col("k"),
      pmod(hash(col("id")), lit(salts))))
    info(f"max reduce-partition share: plain $plainShare%.2f, salted $saltedShare%.2f")
    assert(plainShare >= 0.80, s"fixture lost its skew: $plainShare")
    assert(saltedShare <= 0.55, s"salting failed to spread the hot key: $saltedShare")

    // (b) the TIMING, documented: at local[2] the theoretical ceiling
    // is 2× (one of two tasks carries everything), so the production
    // win — which scales with executor count — can't show as ≥ 2×
    // here. AQE off for a raw comparison; both joins verified equal.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      def time(df: => org.apache.spark.sql.DataFrame): (Double, Long) = {
        df.count() // warm
        val t0 = System.nanoTime()
        val n = df.count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (tPlain, nPlain) = time(left.join(right, Seq("k")))
      val (tSalted, nSalted) = time(graft.operators.Skew.saltedJoin(
        left, right, Seq("k"), spread = col("id"), salts = salts))
      assert(nPlain == nSalted, "salting must not change the relation")
      info(f"plain $tPlain%.2f s vs salted $tSalted%.2f s " +
        f"(${tPlain / tSalted}%.2fx at the local[2] 2x ceiling)")
      // soft guard: salting must not be pathologically slower at the
      // 2-core ceiling — the win itself is the partition-balance
      // assertion (a); measured ~0.8× here, see header comment
      assert(tSalted <= tPlain * 2.0,
        f"salted join pathologically slow: $tSalted%.2f vs $tPlain%.2f")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", bcast)
    }
    left.unpersist(); right.unpersist()
  }

  smokeTest("span dedup stays linear at 100k docs with 200-deep span repeats") {
    // every base-doc span recurs in ~200 replicas: the first-occurrence
    // min(struct) aggregate is map-side combined, so the hot spans must
    // NOT concentrate (the row_number-window formulation would); the
    // keep-join fans 1:1 per exploded row.
    val total = corpusSize
    val t0 = System.nanoTime()
    val out = Dedup.spanDedupByTokens(corpus, "doc_id", "text", spanTokens = 5)
      .cache()
    val nRows = out.count()
    val sums = out.agg(sum("n_spans"), sum("n_kept")).head()
    val (spanSum, keptSum) = (sums.getLong(0), sums.getLong(1))
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"span dedup: $nRows rows, kept $keptSum of $spanSum spans " +
      s"in ${secs.round} s")
    out.unpersist()
    assert(nRows == total, "must emit exactly one row per doc")
    // every base-text span dedups to its first copy; survivors are the
    // per-replica unique-tail straddle windows (≤ ~2 per doc)
    assert(keptSum < spanSum / 4,
      s"200-deep replicas must lose their shared spans: $keptSum/$spanSum")
    assert(secs < 180, s"span dedup blew up: $secs s")
  }

  smokeTest("exact-substring dedup stays occurrence-linear at 100k docs with 200-deep repeats") {
    // every base-text 5-gram recurs in ~200 replicas (and the shared
    // tails recur across the 500 docs of a rep): the duplicated-gram
    // gate must collapse map-side (min(struct) ‖ count partials — a
    // row_number window would funnel each hot gram through one task),
    // the mark join fans 1:1 per occurrence, and the island window
    // sorts only each doc's own marked windows. Nothing quadratic.
    val total = corpusSize
    val t0 = System.nanoTime()
    val out = Dedup.exactSubstrSpans(corpus, "doc_id", "text", minTokens = 5)
      .cache()
    val nRows = out.count()
    val docsWithSpans = out.select("doc_id").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"exact-substring: $nRows merged spans over $docsWithSpans docs " +
      s"in ${secs.round} s")
    out.unpersist()
    // all but the gram-first copies are near-fully covered → one-ish
    // merged region per doc, and output stays O(docs), not O(grams)
    assert(docsWithSpans > total * 9 / 10,
      s"replicas must be marked: $docsWithSpans/$total")
    assert(nRows < total * 4, s"merged-span output must stay O(docs): $nRows")
    assert(secs < 180, s"exact-substring dedup blew up: $secs s")
  }

  smokeTest("incremental near screen: 500-doc batch vs the 100k corpus") {
    // batch = the 500 base docs; each near-dups its whole replica
    // group (jaccard ≈ 0.92), so candidates per batch doc are bounded
    // by band-bucket occupancy (≤ group size per band), never |corpus|.
    corpusSize
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.01")
      .select(col("doc_id"), col("text"))
    val shortDocs = base.filter(
      size(graft.ext.TextOps.tokens(col("text"))) < 3).count()
    val t0 = System.nanoTime()
    val kept = Dedup.newAgainstReferenceNear(base, corpus, "doc_id", "text")
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"incremental near: $kept of 500 kept in ${secs.round} s " +
      s"($shortDocs too short to shingle)")
    // every shingle-able batch doc is a near-dup of its replicas; docs
    // with < 3 tokens have no bands and legitimately survive
    assert(kept == shortDocs, s"expected only short docs kept, got $kept")
    assert(secs < 180, s"incremental near screen blew up: $secs s")
  }

  smokeTest("bigram LM surprisal is occurrence-linear at 100k docs") {
    // the LM table is vocab-bounded (200 replicas share their base
    // vocabulary, so |LM| stays ~500-doc-sized while occurrences grow
    // 200×): the occurrence→LM joins must broadcast or hash, never
    // sort occurrence-scale data, and the whole thing is two aggs +
    // two joins — minutes would mean a quadratic crept in.
    val total = corpusSize
    val t0 = System.nanoTime()
    val out = graft.ext.TextOps.lmSurprisal(corpus).cache()
    val nRows = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val meanBits = out.agg(avg("bits_per_bigram")).head().getDouble(0)
    out.unpersist()
    info(s"lm surprisal: $nRows docs in ${secs.round} s, mean $meanBits bits")
    assert(nRows == total, "must emit exactly one row per doc")
    assert(secs < 120, s"LM surprisal blew up: $secs s")
  }

  smokeTest("BPE training is vocab-bounded: 100k docs cost one scan plus dict-sized iterations") {
    // the corpus is 200 near-copies of 500 base docs: occurrences grow
    // 200× but the vocabulary barely moves, so the 8 merge iterations
    // must run in near-constant time after the single word-frequency
    // scan — minutes would mean an iteration is re-scanning the corpus
    val total = corpusSize
    val t0 = System.nanoTime()
    val merges = graft.ext.Bpe.trainMerges(corpus, "text", nMerges = 8)
      .collect()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"BPE over $total docs: ${merges.length} merges in ${secs.round} s")
    assert(merges.length == 8, "rich corpus must sustain 8 merges")
    assert(secs < 120, s"BPE training blew up: $secs s")
  }

  smokeTest("BPE trains 256 merges on 100k docs and applies them in one pass (r10 VERDICT #1)") {
    // production merge counts: the old per-merge-Spark-job trainer was
    // 256 sequential jobs (minutes of scheduler latency alone) and the
    // old apply a 256-deep regexp_replace chain Catalyst won't codegen.
    // The driver-loop trainer + single-mapPartitions apply must do the
    // whole train+segment round under the same budget 8 merges had.
    // the shared smoke corpus is vocabulary-poor (234 distinct words —
    // pair-exhausts near 200 merges); a per-doc md5 word widens the
    // vocabulary to ~100k distinct words, the dict size 256 merges need
    val rich = corpus.withColumn("text",
      concat(col("text"), lit(" "), md5(col("doc_id").cast("string"))))
    val total = corpusSize
    val t0 = System.nanoTime()
    val model = graft.ext.Bpe.trainMerges(rich, "text", nMerges = 256)
      .orderBy("step").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val tTrain = (System.nanoTime() - t0) / 1e9
    val seg = graft.ext.Bpe.segment(rich, "text", model)
    val agg = seg.toDF().agg(
      count(lit(1)).as("n_words"),
      sum(col("freq") * col("n_tokens")).as("corpus_tokens")).head()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"BPE-256 over $total docs: ${model.length} merges in ${tTrain.round} s, " +
      s"${agg.getLong(0)} vocab words / ${agg.getLong(1)} corpus tokens " +
      s"segmented by ${secs.round} s total")
    assert(model.length == 256, "rich corpus must sustain 256 merges")
    assert(agg.getLong(0) > 0 && agg.getLong(1) > 0)
    assert(secs < 120, s"BPE-256 train+apply blew up: $secs s")
  }

  smokeTest("image phash dedup survives a 25%-hot identical image (bucket guard + exact path)") {
    // 25% of 100k images are ONE scene: every dHash band of the hot
    // image is a 25k-deep bucket (C(25k,2) ≈ 312M candidate pairs).
    // The hot mass is hash-IDENTICAL, so the linear exact path
    // (groupBy phash) owns it; the banded pair join runs under
    // maxBucket and only enumerates the benign near-dup tail. Real
    // decode throughout: 100k PNG encodes + javax.imageio decodes.
    // high-entropy scenes (the catalog's structured fixture exists for
    // the arithmetic oracle; its scene space is deliberately small and
    // would flood a 100k corpus with genuine near-dups): each scene's
    // pixels are hash noise, so distinct scenes sit ~32 bits apart and
    // the only near pairs are the planted ones (id%100==2 carries
    // scene id-1 with one pixel inverted — a <=2-bit dHash flip)
    import spark.implicits._
    def noisyPng(scene: Long, bump: Boolean): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        9, 8, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until 8; x <- 0 until 9) {
        // splitmix64 finalizer: a weaker mix left only ~2k distinct
        // hashes across 100k scenes and flooded the pair join
        var h = scene * 72 + y * 9 + x
        h = (h ^ (h >>> 30)) * 0xbf58476d1ce4e5b9L
        h = (h ^ (h >>> 27)) * 0x94d049bb133111ebL
        h ^= h >>> 31
        var g = (h & 0xff).toInt
        if (bump && x == 3 && y == 3) g = (g + 128) % 256
        img.setRGB(x, y, (g << 16) | (g << 8) | g)
      }
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "png", bos)
      bos.toByteArray
    }
    val payloads = spark.range(100000L).as[Long]
      .mapPartitions(_.map { id =>
        val hot = id % 4 == 0
        val planted = !hot && id % 100 == 2
        val scene = if (hot) 42L else if (planted) id - 1 else id
        (id, noisyPng(scene, planted))
      }).toDF("doc_id", "payload").repartition(8)
    val t0 = System.nanoTime()
    val hashed = graft.ext.MultiModal.imageDHash(payloads).localCheckpoint()
    val total = hashed.count()
    val hotGroup = hashed.groupBy("phash").agg(count(lit(1)).as("n"))
      .agg(max("n")).head().getLong(0)
    val nPairs = graft.ext.Dedup.hammingPairs(hashed, "doc_id", "phash",
      maxHamming = 3, pieces = 6, maxBucket = 500).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"phash over $total images: hot group $hotGroup, " +
      s"$nPairs guarded near-dup pairs in ${secs.round} s")
    assert(total == 100000L)
    assert(hotGroup >= 25000L, "exact path must collapse the hot image")
    assert(nPairs >= 500, "planted near-dup tail must still pair")
    assert(nPairs < 100000, "guard must keep the pair set linear-ish")
    assert(secs < 180, s"phash dedup blew up: $secs s")
  }

  smokeTest("split-leakage audit survives a 25%-hot duplicate text (LSH maxBucket guard)") {
    // r9 VERDICT #7: 25% of 100k docs are ONE text — every band of the
    // hot doc is a 25k-deep bucket, the C(25k,2) ≈ 312M-pair regime
    // the maxBucket guard must drop BEFORE the candidate join. The
    // rest are unique docs with 97 shared drifting tails providing a
    // benign near-dup population. Same shape as the split_leakage
    // catalog query (assign ∘ lshPairs ∘ cross-filter), skewed input.
    val docs = spark.range(100000L).select(col("id").as("doc_id"),
        when(col("id") % 4 === 0,
          lit("the same hot boilerplate banner text repeated across the " +
            "whole crawl with no variation at all"))
          .otherwise(concat(
            lit("unique document number "), col("id").cast("string"),
            lit(" carrying its own words plus shared drifting tail "),
            (col("id") % 97).cast("string"),
            lit(" and a bit more unique trailing content "),
            (col("id") % 9973).cast("string")))
          .as("text"))
      .repartition(8).cache()
    val total = docs.count()
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashLshPairs(docs, "doc_id", "text", maxBucket = 200)
    val sp = graft.ext.Splits.assign(docs.select("doc_id"), "doc_id",
        Seq("train" -> 80, "val" -> 10, "test" -> 10), salt = "graft")
      .select(col("doc_id"), col("split"))
    val leaks = pairs
      .join(sp.toDF("id_a", "split_a"), "id_a")
      .join(sp.toDF("id_b", "split_b"), "id_b")
      .filter(col("split_a") =!= col("split_b"))
      .count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"split leakage over $total docs (25% hot): $leaks cross-split " +
      s"pairs in ${secs.round} s")
    docs.unpersist()
    // the hot doc's bands are dropped (exact dups are the fingerprint
    // pass's job); time is the contract — an undropped hot bucket is
    // minutes-vs-seconds
    assert(secs < 120, s"leakage audit blew up on the hot key: $secs s")
  }

  smokeTest("semantic dedup at a 25%-hot embedding: assignment linear, guard refuses pair search") {
    // r9 VERDICT #7: 25% of 100k vectors are one identical embedding —
    // one coarse cluster holds ≥ 25k members, the Σ|cluster|² regime.
    // The two-level ASSIGNMENT must stay linear under the hot key
    // (broadcast supers + equality bucket join + groupBys), and
    // semanticDedup's maxCluster guard must refuse the pair search
    // with the remediation message instead of grinding through ~312M
    // cosine pairs.
    import spark.implicits._
    val dim = 16
    val vecs = spark.range(100000L).as[Long].map { id =>
      val v = new Array[Float](dim)
      if (id % 4 == 0L) { v(0) = 1f } // the hot direction
      else {
        var i = 0
        while (i < dim) {
          v(i) = (((id * dim + i) * 2654435761L % 1000L) / 1000.0f); i += 1
        }
      }
      (id, v)
    }.toDF("vec_id", "embedding").repartition(8).cache()
    val total = vecs.count()
    val t0 = System.nanoTime()
    val assigned = graft.ext.SemDedup.assignTwoLevel(
      vecs, "vec_id", "embedding", nCenters = 316)
    assert(assigned.count() == total, "every vector assigned exactly once")
    val tAssign = (System.nanoTime() - t0) / 1e9
    info(s"two-level assignment over $total vectors (25% hot): ${tAssign.round} s")
    assert(tAssign < 120, s"assignment blew up on the hot key: $tAssign s")
    val t1 = System.nanoTime()
    val e = intercept[IllegalStateException] {
      graft.ext.SemDedup.semanticDedup(vecs, "vec_id", "embedding",
        nCenters = 316, threshold = 0.9, maxCluster = 2000)
    }
    val tGuard = (System.nanoTime() - t1) / 1e9
    assert(e.getMessage.contains("maxCluster"))
    info(s"hot-cluster guard fired in ${tGuard.round} s")
    assert(tGuard < 120, s"guard must fire from a linear aggregate: $tGuard s")
    vecs.unpersist()
  }

  smokeTest("boilerplate signals stay linear when one gram covers 25% of docs") {
    // A gram shared by f docs costs f PROBE rows in the gram-df join —
    // never f² (there is no self-join anywhere in this operator). With
    // 25% of 100k docs carrying one hot gram, a pair-join formulation
    // would be in the 312M-row regime; the corpus-statistic
    // formulation stays at |distinct grams per doc| rows total.
    val docs = spark.range(100000L).select(col("id").as("doc_id"),
        concat(
          when(col("id") % 4 === 0, lit("hot banner gram here "))
            .otherwise(lit("")),
          lit("unique body "), col("id").cast("string"),
          lit(" more words "), (col("id") % 9973).cast("string"))
          .as("text"))
      .repartition(8).cache()
    val total = docs.count()
    val t0 = System.nanoTime()
    val out = graft.ext.TextOps.boilerplateSignals(docs)
    val dropped = out.filter(!col("keep")).count()
    val rows = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"boilerplate over $total docs (25% hot gram): $rows rows, " +
      s"$dropped dropped, in ${secs.round} s")
    assert(rows == total)
    // hot docs have 8 distinct trigrams of which 5 are corpus-common
    // (4 from the banner prefix + the "more words <id%9973>" tail
    // shared by ~10 docs) → ratio 0.625 > 0.6, dropped; unique docs
    // sit at 1 of 4 → kept
    assert(dropped == 25000, s"unexpected drop count $dropped")
    docs.unpersist()
    assert(secs < 120, s"boilerplate blew up on the hot gram: $secs s")
  }

  smokeTest("CDC chunk dedup is occurrence-linear at 100k docs with 200-deep repeats") {
    // 200 near-copies share most CDC chunks: the census counts
    // occurrences (200 rows per shared chunk), never pairs (C(200,2))
    val t0 = System.nanoTime()
    val out = Dedup.cdcChunkReport(corpus, "doc_id", "text")
    val n = out.count()
    val shared = out.filter(col("n_shared_chunks") > 0).count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"CDC census over $corpusSize docs: $shared/$n docs share chunks in ${secs.round} s")
    assert(n == corpusSize)
    assert(shared > corpusSize / 2,
      "the 200-copy groups must show shared chunk mass")
    assert(secs < 120, s"CDC census blew up: $secs s")
  }

  smokeTest("temperature mixture at 100k docs with a 90%-hot stratum") {
    // the declared worst case: the fractional-quota pick is one rank
    // window per stratum, so a dominant stratum serializes its rank;
    // the smoke pins that 90k rows of per-stratum row_number complete
    // in seconds and the Σ n_copies budget invariant holds exactly
    val docs = spark.range(100000L).select(col("id").as("doc_id"),
        when(col("id") % 10 < 9, "hot").otherwise(concat(lit("s"), col("id") % 7))
          .as("lang"))
      .repartition(8).cache()
    docs.count()
    val t0 = System.nanoTime()
    val out = graft.ext.Sampling.temperatureResample(
      docs, "doc_id", "lang", totalOut = 250000L)
    val sum = out.agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"temperature mixture over 100k docs, hot stratum: ${secs.round} s")
    assert(sum == 250000L, s"budget invariant broke: $sum")
    // α=½ flattening: the 90% stratum must hold well under 90% of the
    // output mass (√-scaled share ≈ 53% against seven √-equal tails)
    val hot = out.filter(col("lang") === "hot")
      .agg(org.apache.spark.sql.functions.sum("n_copies")).head.getLong(0)
    assert(hot < 150000L, s"no flattening: hot stratum got $hot of 250000")
    docs.unpersist()
    assert(secs < 120, s"hot-stratum rank window blew up: $secs s")
  }

  smokeTest("knn graph at 100k vectors: bounded blocks linear, hot block refused") {
    // block-equality candidates are Σ block²: 1000 blocks of ~100
    // vectors = ~10M scored pairs (linear-ish, seconds); one 25%-hot
    // block would be 625M pairs on its own — the guard must refuse
    // BEFORE the join
    val dim = 8
    val vecs = spark.range(100000L).select(col("id").as("vec_id"),
        array((0 until dim).map(i =>
          pmod(col("id") * (i * 2 + 3) + i, lit(97)).cast("float") - 48.0f): _*)
          .as("embedding"),
        (col("id") % 1000).cast("string").as("label"))
      .repartition(8).cache()
    vecs.count()
    val t0 = System.nanoTime()
    val g = graft.ext.Similarity.mineTriplets(vecs, "vec_id", "embedding",
      "label", k = 5, negFromRank = 3, margin = 0.05, maxBlock = 500)
    val n = g.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"triplets over 100k vectors / 1000 blocks: $n rows in ${secs.round} s")
    assert(n > 0)
    assert(secs < 180, s"blocked knn blew up: $secs s")
    // 25%-hot block: guard refuses before the quadratic join
    val hot = vecs.withColumn("label",
      when(col("vec_id") % 4 === 0, "HOT").otherwise(col("label")))
    val e = intercept[IllegalStateException] {
      graft.ext.Similarity.knnGraph(hot, "vec_id", "embedding", "label",
        k = 5, maxBlock = 500).count()
    }
    assert(e.getMessage.contains("HOT"))
    vecs.unpersist()
  }

  smokeTest("PQ encode + ADC search at 100k vectors stays broadcast-shaped") {
    // the deployed train-once/search-many plan (the r12 bench form):
    // codebooks from a bounded sample, ONE codegen'd encode pass over
    // 100k vectors, then a 50-query ADC wave = 5M table lookups via a
    // broadcast join — the corpus must never shuffle and the whole
    // search must be seconds, not minutes
    val dim = 64
    val vecs = spark.range(100000L).select(col("id").as("vec_id"),
        array((0 until dim).map(i =>
          pmod(col("id") * (i * 2 + 3) + i * 7, lit(101)).cast("float") - 50.0f): _*)
          .as("embedding"))
      .repartition(8).cache()
    vecs.count()
    val t0 = System.nanoTime()
    val model = graft.ext.Pq.train(vecs, "embedding", dim = dim, m = 8, k = 16)
    val tTrain = (System.nanoTime() - t0) / 1e9
    val t1 = System.nanoTime()
    val enc = graft.ext.Pq.encode(model, vecs, "vec_id", "embedding").cache()
    val nCodes = enc.count()
    val queries = vecs.filter(col("vec_id") % 2000 === 0) // 50 queries
    val hits = graft.ext.Pq.searchTopK(model, enc, vecs, queries,
      "vec_id", "embedding", k = 5, candidateFactor = 20)
    val n = hits.count()
    val secs = (System.nanoTime() - t1) / 1e9
    info(s"PQ over $nCodes vectors: train ${tTrain.round} s, " +
      s"encode+search 50 queries → $n rows in ${secs.round} s")
    assert(nCodes == 100000L && n == 50L * 5)
    enc.unpersist(); vecs.unpersist()
    assert(secs < 120, s"PQ encode+search blew up: $secs s")
  }

  smokeTest("integer PageRank over 1M edges: 10 iterations, linear per round") {
    // 200k nodes x 5 out-edges = 1M edges; each iteration is one
    // equality join + one shuffle-sum over |edges| — 10 rounds must
    // finish in minutes-not-hours territory on local[*], and the
    // rank mass must stay within teleport-floor bounds
    val edges = spark.range(1000000L).select(
        (col("id") % 200000L).as("src"),
        pmod(col("id") % 200000L * 31 + (col("id") / 200000L) * 1009 + 17,
          lit(200000L)).as("dst"))
      .repartition(8).cache()
    val nEdges = edges.count()
    val t0 = System.nanoTime()
    val ranks = graft.operators.PageRank.run(edges, "src", "dst",
      iterations = 10).cache()
    val nNodes = ranks.count()
    val mass = ranks.agg(sum("rank")).head().getLong(0)
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"PageRank over $nEdges edges / $nNodes nodes: " +
      s"mass $mass in ${secs.round} s")
    assert(nNodes == 200000L)
    // floor truncation leaks mass downward but never creates it
    assert(mass <= 1000000000000L && mass > 900000000000L)
    ranks.unpersist(); edges.unpersist()
    assert(secs < 240, s"PageRank blew up: $secs s")
  }

  smokeTest("token-budget window survives 100k docs in ONE source partition") {
    // the operator's declared worst case: budgets are sequential per
    // source, so a single dominant source serializes its whole window
    // into one partition — the smoke pins that 100k rows of running
    // sum complete in seconds (the README documents sub-budget
    // sharding for corpora where one source exceeds executor memory)
    val docs = spark.range(100000L).select(col("id").as("doc_id"),
        lit("src_hot").as("source"),
        (col("id") % 37 + 3).as("n"))
      .repartition(8).cache()
    val total = docs.count()
    val t0 = System.nanoTime()
    val out = graft.ext.Sampling.tokenBudgetSample(docs, "doc_id", "source",
      col("n"), budgets = Seq.empty, defaultBudget = 500000L)
    val kept = out.filter(col("kept")).count()
    val rows = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"token budget over $total docs, one source: $kept kept in ${secs.round} s")
    assert(rows == total && kept > 0 && kept < total)
    docs.unpersist()
    assert(secs < 120, s"single-source window blew up: $secs s")
  }

  smokeTest("end-to-end curation funnel at 1M docs: gate → near-dedup → decontam → mixture") {
    // r12 VERDICT #7: the single-operator smokes above prove each
    // stage alone; this runs the COMPOSITE funnel (the
    // curate_corpus_near shape) over a 1M-doc corpus in ONE run —
    // 5000 base docs × 200 near-copies, 200-deep duplicate groups,
    // languages preserved for the mixture stage.
    val base = graft.Tables.documents(spark, "/root/testdata/sf0.1")
      .select(col("doc_id"), col("lang"), col("text"))
    val big = (0 until 200).map { rep =>
      base.withColumn("doc_id", col("doc_id") + lit(rep * 10000000L))
        .withColumn("text",
          concat(col("text"), lit(s" funnel tail $rep variant "),
            (col("doc_id") % 89).cast("string")))
    }.reduce(_.unionByName(_)).repartition(8).cache()
    val total = big.count()
    assert(total == 1000000L, s"corpus construction: $total")
    val bench = base.filter(col("doc_id") % 20 === 0) // 250 eval docs
    val t0 = System.nanoTime()
    // stage 1 — quality gate against the raw scan (cheapest first);
    // the gated frame is the persist-once boundary every stage after
    // reads (the curate_corpus_near pattern)
    val gated = big
      .filter(graft.ext.TextOps.gopherKeep(col("text")))
      .localCheckpoint()
    val nGated = gated.count()
    // stage 2 — near-dedup keep-set: cluster representatives, linear
    // output (pair enumeration would be C(200,2) per group)
    val keep = Dedup.minhashClusters(gated, "doc_id", "text")
      .filter(col("doc") === col("cluster"))
      .select(col("doc").as("doc_id"))
    val deduped = gated.join(keep, Seq("doc_id"), "left_semi")
    // stage 3 — benchmark decontamination (bench broadcast, corpus
    // unshuffled)
    val cleaned = graft.ext.Decontam.clean(deduped, bench,
      "doc_id", "text", n = 5)
    // stage 4 — temperature mixture over the CURATED counts
    val out = graft.ext.Sampling.temperatureResample(
        cleaned.select("doc_id", "lang"), "doc_id", "lang",
        totalOut = 10000L, salt = "funnel").cache()
    val copies = out.agg(sum("n_copies")).head().getLong(0)
    val nOut = out.count()
    val secs = (System.nanoTime() - t0) / 1e9
    val nDeduped = deduped.count()
    val nCleaned = cleaned.count()
    info(s"funnel: $total → gate $nGated → dedup $nDeduped → " +
      s"decontam $nCleaned → mixture $nOut rows / $copies copies in ${secs.round} s")
    assert(nGated > 0 && nGated < total, "gate must bind")
    assert(nDeduped < nGated / 10, "200-deep dup groups must collapse")
    assert(nCleaned <= nDeduped && nCleaned > 0)
    assert(copies == 10000L, "mixture apportionment must be exact")
    big.unpersist(); out.unpersist()
    assert(secs < 420, s"funnel blew up: $secs s")
  }

  smokeTest("deleteWhere at 1M rows touches only the matching partitions") {
    import spark.implicits._
    val root = java.nio.file.Files
      .createTempDirectory("graft_delete_smoke").toString + "/lake"
    // 1M rows over 40 partitions (20 shards × 2 years)
    val df = spark.range(1000000L)
      .select(col("id"),
        (col("id") % 20).cast("string").as("shard"),
        (lit(2023) + (col("id") / 20) % 2).cast("int").as("y"),
        md5(col("id").cast("string")).as("payload"))
    graft.fred.io.LakeIO.writeParquet(df, root, Seq("shard", "y"))
    // the takedown predicate hits one shard across both years (2
    // leaves of 40); a third of that shard's rows match
    val pred = col("id") % 20 === 7L && col("id") % 3 === 0L
    val expected = spark.read.parquet(root).filter(pred).count()
    val t0 = System.nanoTime()
    val (nPart, nRows) = graft.fred.io.LakeIO.deleteWhere(spark, root,
      pred, Seq("shard", "y"))
    val secs = (System.nanoTime() - t0) / 1e9
    info(s"delete: $nRows rows across $nPart partitions in ${secs.round} s")
    assert(nPart == 2L, "only shard=7's two year-leaves are affected")
    assert(nRows == expected && expected > 0L)
    val left = spark.read.parquet(root)
    assert(left.count() == 1000000L - expected)
    assert(left.filter(pred).count() == 0L)
    assert(secs < 120, s"partition-pruned delete blew up: $secs s")
  }
}
