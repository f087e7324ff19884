package graft

import java.time.LocalDateTime
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Opt-in differential fuzzing of the oracle gate (set GRAFT_FUZZ=1;
  * r10 VERDICT #4): the static testdata exercises one data shape —
  * the r10 events-retimestamping incident showed dtype/value edges
  * are where engines drift. Each seed deterministically generates a
  * small adversarial corpus (unicode words, empty/whitespace docs,
  * duplicate groups, skewed keys, negative/large/zero values, a time
  * axis crossing month+year boundaries), runs an agg/window/text/dedup
  * catalog subset through the REAL gate machinery — `Verify.dump` +
  * `tools/check_oracle.py` in the driver-side python — and asserts
  * every query hash-matches DuckDB on data the fixtures never saw.
  *
  * The word pool deliberately stays on case-stable unicode (é, ñ, 中):
  * locale-sensitive case edges (İ, dotless i) diverge between engines
  * by DESIGN of the engines, not by a bug in this library, and the
  * catalog makes no promise about them.
  */
class FuzzDifferentialSpec extends SparkSpec {
  import spark.implicits._

  private val enabled = sys.env.contains("GRAFT_FUZZ")
  private def fuzzTest(name: String)(body: => Unit): Unit =
    if (enabled) test(name)(body) else ignore(name)(())

  // catalog subset reading ONLY the two generated tables
  private val docQueries = Seq(
    "dedup_exact", "dedup_ngram", "dedup_spans", "split_assign",
    "text_boilerplate", "text_boilerplate_indexed", "text_topgram",
    "text_chunk", "quality_lm_surprisal", "vocab_bpe_merges",
    "vocab_bpe_segment", "text_tokens_bpe",
    // r11 round additions: substring dedup's interval SQL, the frozen
    // LM's OOV path and the datacard's ratio arithmetic all meet
    // dup-heavy unicode corpora the fixtures never saw
    "dedup_substring", "dedup_substring_apply", "quality_lm_indexed",
    "dedup_substring_exact", "dedup_substring_exact_apply", "dedup_longest_match",
    "dedup_substring_incremental", "dedup_substring_incremental_apply",
    "dedup_substring_incremental_bucketed",
    "report_dup_coverage", "quality_entropy",
    "report_corpus", "decontam_spans", "decontam_spans_clean",
    "decontam_substring_exact", "decontam_longest_bench", "report_bench_contamination",
    "decontam_substring_stream", "curate_corpus_ingest", "report_pii_density",
    "report_pii_density_incremental", "report_corpus_incremental",
    "report_doc_novelty", "report_doc_novelty_incremental",
    // closing-stretch additions: the temperature mixture's sqrt/
    // largest-remainder walk on skewed 2-3-lang corpora, and the
    // fertility roll-up's unicode words through the BPE replay
    "sample_temperature", "report_bpe_fertility", "dedup_cdc",
    // r12 widening (r11 VERDICT #4): every documents-based family —
    // the full dedup battery (portable-hash LSH bands, CC canonical,
    // winnowing, edit-distance, incremental), the text battery
    // (gopher/ntile/dsir/classifier/tfidf/bm25/redact/scrub/
    // normalize), decontam, splits repair, sampling, packing, the
    // curation composites, the crawl layer, and the multimodal
    // family (payloads are pure functions of text/doc_id, so their
    // pixel/sample-exact oracles replay on fuzz corpora too)
    "dedup_simhash", "dedup_minhash_lsh", "dedup_minhash_clusters",
    "dedup_components", "dedup_canonical", "dedup_canonical_shared",
    "dedup_winnowing", "dedup_editdist", "dedup_threshold_sweep",
    "dedup_incremental", "dedup_incremental_near",
    "dedup_incremental_near_saved",
    "decontam_overlap", "decontam_bloom",
    "text_stats", "text_quality", "text_langid", "text_redact",
    "text_scrub_rare", "text_repetition", "text_bm25", "text_tfidf",
    "text_fingerprint", "text_normalize", "text_tokens_regex",
    "vocab_topk", "vocab_bpe_shared", "vocab_collocations",
    "agg_heavy_hitters",
    // unigram-LM trainer: exact integer bit-space end to end, and the
    // fuzz word pool (max 8 code points, unicode incl. CJK) sits well
    // inside the maxWordLen=16 dp unroll — the code-point-vs-UTF-16
    // seam is exactly what the unicode words exercise
    "vocab_unigram", "vocab_unigram_segment", "report_unigram_fertility",
    // WordPiece: the HUGEINT likelihood argmax and the greedy unroll
    // meet unicode words + duplicate-heavy corpora; the three-way
    // compare replays all three tokenizer chains in one statement
    "vocab_wordpiece", "vocab_wordpiece_segment", "report_tokenizer_compare",
    "quality_gopher", "quality_ntile", "quality_dsir", "quality_lm_dsir",
    "quality_classifier",
    "source_overlap", "profile_source_overlap",
    "pack_budget", "pack_concat", "pack_stats", "pack_length_buckets",
    "sample_hash", "sample_cap_per_group", "sample_stratified",
    "sample_mixture", "sample_token_budget", "sample_weighted_systematic",
    "split_leakage", "split_repair",
    "curate_corpus", "curate_corpus_gopher", "curate_corpus_near",
    "curate_corpus_communities", "curate_corpus_substring",
    "curate_corpus_mix", "curate_corpus_audit",
    "crawl_canonicalize", "crawl_domain_cap", "crawl_domain_pagerank",
    "crawl_domain_reputation", "text_dedup_lines", "text_strip_lines",
    "layout_interleave", "crawl_priority", "pack_utilization",
    "curate_corpus_classified",
    "mm_payload_meta", "mm_imageio_decode", "mm_resize", "mm_resize_real",
    "mm_decode_features", "mm_frame_sample", "mm_audio_meta",
    "dedup_image_phash", "dedup_audio_fp",
    "layout_zorder", "layout_shuffle")

  // embeddings-based subset (fuzz vectors: random nonzero 64-dim
  // floats, ~15% exact duplicates, a hot label). The recall-floor
  // entries (similarity_pq / _ivf_kmeans / _lsh) stay out BY DESIGN:
  // their floors are measured properties of the REAL corpus geometry,
  // not invariants — adversarial vectors can legitimately sink them.
  private val embQueries = Seq(
    "similarity_topk", "similarity_ivf", "similarity_knn_graph",
    "mine_triplets", "graph_pagerank", "graph_triangles", "graph_kcore",
    "similarity_rrf", "graph_link_predict", "similarity_quantized",
    "embedding_quantize", "embedding_stats", "embedding_centroids",
    "dedup_embedding", "dedup_semantic", "decontam_semantic",
    "similarity_lsh_exhaustive", "similarity_ivf_exhaustive",
    "similarity_mrl_recall",
    // exhaustive-probe append ≡ brute force by construction, so the
    // engine-specific centroids are invisible — fuzz-safe
    "similarity_ivf_append",
    // exhaustive-probe erase ≡ brute force over survivors — same
    // argument; the erase machinery itself is what the fuzz stresses
    "similarity_ivf_erase",
    // the frozen quantizer is md5-deterministic, so both forms replay
    // exactly on ANY id/vector set (including reused exact-dup vectors)
    "dedup_incremental_semantic", "dedup_incremental_semantic_saved",
    // the re-center re-draw is the same md5-min rule, so the lifecycle
    // replays exactly on any vector set; the PQ erase searches with
    // every survivor reaching the exact rerank — brute force over
    // survivors by construction, fuzz-safe like the IVF form
    "dedup_semantic_recenter", "similarity_pq_erase")
  // TPC-H-shaped subset: generated with consistent foreign keys, a
  // hot customer (30% of orders) and a hot order (20% of lineitem) so
  // the salted operators meet real skew, and two years of dates so
  // YoY windows have a prior year to lag into
  private val tpchQueries = Seq(
    "join_star_revenue", "join_semi", "join_left_outer", "join_full_outer",
    "topk_orders", "set_except", "set_intersect", "agg_rollup", "agg_cube",
    "agg_mode", "agg_quantiles", "agg_salted", "join_salted", "window_yoy",
    "window_seasonal")

  // the daily-series windows key on observation_day (the reference's
  // FRED within-one-month series shape), so the fuzz time axis stays
  // inside one calendar month — still 5 weekly cohort offsets
  private val eventQueries = Seq(
    "fred_monthly_agg", "fred_daily_agg", "window_mom",
    "window_locf", "window_sessionize", "window_tumbling",
    "window_moving_avg", "window_rank_share", "window_cume",
    "window_session", "series_asof", "series_asof_tolerance",
    "series_asof_forward", "series_asof_forward_tolerance", "series_asof_nearest",
    "events_transitions", "events_paths",
    "events_retention", "events_retention_weekly",
    "events_funnel", "pivot_daily", "unpivot_daily", "agg_histogram",
    "scalar_robust_z",
    // r12 widening: the scalar/profile/agg batteries over the fuzz
    // event stream — zero/negative/huge 2-dp values are exactly the
    // space their exact-integer arithmetic claims
    "scalar_dates", "scalar_impute", "scalar_minmax", "scalar_zscore",
    "scalar_winsorize", "drift_chisq", "agg_linfit", "agg_mad",
    "agg_stats_moments", "agg_corr", "agg_equidepth",
    "quality_expectations", "profile_columns", "quality_funnel",
    "fred_clean_cast", "fred_dedup_sync", "fred_upsert_merge",
    "fred_yearly_gold", "window_ewma", "window_interpolate",
    "agg_hll_portable", "agg_countmin", "join_interval_overlap",
    "agg_bloom_portable", "agg_hll_overlap", "series_changepoint",
    "agg_cms_join_card", "series_theilsen", "agg_cms_accuracy")

  private val words = Vector(
    "the", "data", "naïve", "café", "señor", "über", "løsning", "中文",
    "数据", "pipeline", "zero", "0042", "x9y", "aaaa", "ab", "a",
    "banner", "reserved", "contact", "policy")

  private def randText(rnd: scala.util.Random): String = {
    val roll = rnd.nextInt(100)
    if (roll < 8) ""
    else if (roll < 12) "   \t  "
    else {
      val n = 1 + rnd.nextInt(40)
      val sep = if (rnd.nextBoolean()) " " else "  "
      (0 until n).map { _ =>
        val w = words(rnd.nextInt(words.length))
        if (rnd.nextInt(10) == 0) w + "," else w // punctuation edge
      }.mkString(sep)
    }
  }

  private def randDocs(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed)
    val texts = scala.collection.mutable.ArrayBuffer.empty[String]
    val rows = (0 until n).map { i =>
      // 25% duplicates of an earlier text → real groups for the dedup
      // family; the rest fresh
      val t =
        if (texts.nonEmpty && rnd.nextInt(4) == 0)
          texts(rnd.nextInt(texts.size))
        else { val x = randText(rnd); texts += x; x }
      val lang = Seq("en", "de", "zz")(rnd.nextInt(3))
      val src = Seq("web", "books")(rnd.nextInt(2))
      (i.toLong, t, lang, src, t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  private def randEvents(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed * 7919 + 17)
    val base = LocalDateTime.of(2024, 1, 1, 0, 0, 0)
    val rows = (0 until n).map { i =>
      // skewed users: half the stream on 3 hot users
      val user = if (rnd.nextBoolean()) rnd.nextInt(3).toLong
                 else 10L + rnd.nextInt(40)
      // 30 days: one calendar month (see eventQueries note), 5 Mondays
      val ts = base.plusSeconds(rnd.nextLong(30L * 24 * 3600))
      val etype = Seq("view", "click", "purchase")(rnd.nextInt(3))
      // 2-dp values incl. zero, negatives, large magnitudes — the
      // exact-integer micro-sum contract must hold for all of them
      val value = rnd.nextInt(5) match {
        case 0 => 0.0
        case 1 => -rnd.nextInt(10000) / 100.0
        case 2 => rnd.nextInt(100000000) / 100.0
        case _ => rnd.nextInt(10000) / 100.0
      }
      // props is JSON in the driver testdata; the clean-cast/impute
      // queries parse it, so the fuzz stream must stay in-format
      (i.toLong, ts, user, etype, value, s"""{"k": ${rnd.nextInt(99)}}""")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
  }

  private def randEmbeddings(seed: Int, n: Int): DataFrame = {
    val rnd = new scala.util.Random(seed * 6007 + 101)
    val vecs = scala.collection.mutable.ArrayBuffer.empty[Array[Float]]
    val rows = (0 until n).map { i =>
      val v =
        if (vecs.nonEmpty && rnd.nextInt(7) == 0) vecs(rnd.nextInt(vecs.size))
        else {
          // nonzero by construction (slot i%64 forced); mixed signs,
          // magnitudes spanning 1e-2..1e3
          val scale = Seq(0.01f, 1.0f, 1000.0f)(rnd.nextInt(3))
          val a = Array.tabulate(64)(_ =>
            (rnd.nextInt(2001) - 1000) / 1000.0f * scale)
          a(i % 64) = ((rnd.nextInt(999) + 1) / 1000.0f) * scale
          vecs += a; a
        }
      val label = if (rnd.nextBoolean()) 0 else 1 + rnd.nextInt(3)
      (i.toLong, v.toSeq, label)
    }
    rows.toDF("vec_id", "embedding", "label")
      .select(col("vec_id"),
        col("embedding").cast("array<float>").as("embedding"),
        col("label").cast("int").as("label"))
  }

  private def d2(rnd: scala.util.Random, lo: Int, hi: Int): Double =
    (lo * 100 + rnd.nextInt((hi - lo) * 100)) / 100.0

  private def writeTpch(seed: Int, dir: String): Unit = {
    val rnd = new scala.util.Random(seed * 104729 + 31)
    val day0 = LocalDateTime.of(2023, 1, 1, 0, 0, 0)
    def ts(): LocalDateTime = day0.plusSeconds(rnd.nextLong(728L * 24 * 3600))
    writeTable((0 until 3).map(k => (k, s"R$k")).toDF("r_regionkey", "r_name"),
      dir, "region")
    writeTable((0 until 6).map(k => (k, s"N$k", k % 3))
      .toDF("n_nationkey", "n_name", "n_regionkey"), dir, "nation")
    writeTable((0 until 20).map(k =>
        (k.toLong, s"Customer#$k", k % 6, d2(rnd, -10, 100),
          Seq("AUTOMOBILE", "BUILDING", "MACHINERY")(rnd.nextInt(3))))
      .toDF("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
      dir, "customer")
    writeTable((0 until 5).map(k =>
        (k.toLong, s"Supplier#$k", k % 6, d2(rnd, -10, 100)))
      .toDF("s_suppkey", "s_name", "s_nationkey", "s_acctbal"), dir, "supplier")
    writeTable((0 until 15).map(k =>
        (k.toLong, s"Part#$k", s"Brand#${k % 3}", s"TYPE ${k % 4}",
          1 + rnd.nextInt(50), d2(rnd, 1, 2000)))
      .toDF("p_partkey", "p_name", "p_brand", "p_type", "p_size",
        "p_retailprice"), dir, "part")
    writeTable((0 until 60).map { k =>
        // hot customer 0: the skew the salted join exists for
        val cust = if (rnd.nextInt(10) < 3) 0L else rnd.nextInt(20).toLong
        (k.toLong, cust, Seq("F", "O", "P")(rnd.nextInt(3)),
          d2(rnd, 1, 5000), ts(), s"${1 + rnd.nextInt(5)}-PRIORITY")
      }.toDF("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority"), dir, "orders")
    writeTable((0 until 200).map { k =>
        val ord = if (rnd.nextInt(10) < 2) 0L else rnd.nextInt(60).toLong
        (ord, rnd.nextInt(15).toLong, rnd.nextInt(5).toLong,
          1 + rnd.nextInt(7), (1 + rnd.nextInt(50)).toDouble,
          d2(rnd, 1, 10000), rnd.nextInt(11) / 100.0, rnd.nextInt(9) / 100.0,
          Seq("A", "N", "R")(rnd.nextInt(3)), Seq("O", "F")(rnd.nextInt(2)),
          ts())
      }.toDF("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
        "l_quantity", "l_extendedprice", "l_discount", "l_tax",
        "l_returnflag", "l_linestatus", "l_shipdate"), dir, "lineitem")
  }

  /** Single-FILE parquet at `$dir/$name.parquet` — the layout both
    * `Tables.path` and the gate's `read_parquet` expect. */
  private def writeTable(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = new java.io.File(s"$dir/__tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(fail(s"no part file for $name"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete()
  }

  private def runSeed(seed: Int): Unit = {
    val dir = java.nio.file.Files
      .createTempDirectory(s"graft_fuzz_$seed").toString
    writeTable(randDocs(seed, 40 + seed % 5 * 10), dir, "documents")
    writeTable(randEvents(seed, 300), dir, "events")
    writeTable(randEmbeddings(seed, 60), dir, "embeddings")
    writeTpch(seed, dir)
    val outDir = s"$dir/out"
    Verify.dump(spark, dir, outDir,
      Some((docQueries ++ eventQueries ++ tpchQueries ++ embQueries).toSet))
    val log = new StringBuilder
    val code = scala.sys.process.Process(
      Seq("python3", "tools/check_oracle.py", dir, outDir),
      new java.io.File("/root/repo"))
      .!(scala.sys.process.ProcessLogger(l => log.append(l).append('\n')))
    val report = log.toString
    info(s"seed $seed: " + report.linesIterator.toSeq.lastOption.getOrElse(""))
    assert(code == 0 && !report.contains("FAIL"),
      s"seed $seed diverged from DuckDB:\n$report")
    val passes = report.linesIterator.count(_.startsWith("PASS"))
    val expected = docQueries.size + eventQueries.size +
      tpchQueries.size + embQueries.size
    assert(passes == expected,
      s"seed $seed: expected $expected hash-checked queries, " +
        s"saw $passes:\n$report")
  }

  for (seed <- 1 to 10)
    fuzzTest(s"differential fuzz seed $seed: catalog subset ≡ DuckDB on adversarial data") {
      runSeed(seed)
    }
}
