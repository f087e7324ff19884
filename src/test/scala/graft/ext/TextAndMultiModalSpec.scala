package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class TextAndMultiModalSpec extends SparkSpec {
  import spark.implicits._

  // ----------------------------------------------------------- TextOps

  test("spreadNarrow: widens a narrow frame to parallelism, rows unchanged; wide frames untouched") {
    val p = spark.sparkContext.defaultParallelism
    val narrow = Seq.tabulate(100)(i => (i.toLong, s"doc $i"))
      .toDF("doc_id", "text").coalesce(1)
    assert(narrow.rdd.getNumPartitions == 1)
    val spread = TextOps.spreadNarrow(narrow, "doc_id")
    assert(spread.rdd.getNumPartitions == p,
      s"expected $p partitions, got ${spread.rdd.getNumPartitions}")
    // the repartition relocates rows, never changes them
    assert(spread.collect().toSet == narrow.collect().toSet)
    // an already-wide frame passes through with its plan untouched
    // (the production-scale no-op guard)
    val wide = narrow.repartition(p + 1, col("doc_id"))
    assert(TextOps.spreadNarrow(wide, "doc_id") eq wide)
  }

  test("regexTokens: splits on non-letter/number runs, lowercases, drops empties") {
    val out = Seq("Hello, World!! 42x").toDF("text")
      .select(TextOps.regexTokens(col("text"))).as[Seq[String]].head()
    assert(out == Seq("hello", "world", "42x"))
  }

  test("stopwordCount counts only profile words") {
    val out = Seq("the cat and the dog").toDF("text")
      .select(TextOps.stopwordCount(TextOps.tokens(col("text")))).as[Int].head()
    assert(out == 3) // the, and, the
  }

  test("langId: marker-word argmax with alphabetical tiebreak and 'und' fallback") {
    val out = Seq(
      ("en", "the cat is in that house and it is warm"),
      ("de", "der hund ist nicht mit der katze und das ist gut"),
      ("fr", "le chat est dans les jardins et la maison"),
      ("und", "zzz qqq xxx")
    ).toDF("expected", "text")
      .select(col("expected"), TextOps.langId(col("text")).as("got"))
      .as[(String, String)].collect()
    out.foreach { case (exp, got) => assert(got == exp, s"expected $exp got $got") }
  }

  test("fingerprint: whitespace/case-normalized md5 equality") {
    val out = Seq(("a B  c", "A b C "), ("a b c", "a b d")).toDF("x", "y")
      .select(
        (TextOps.fingerprint(col("x")) === TextOps.fingerprint(col("y"))).as("eq"))
      .as[Boolean].collect()
    assert(out.toSeq == Seq(true, false))
  }

  test("qualitySignals + qualityScore: ratios and bounded score") {
    val df = Seq((1L, "the cat sat on a mat, quietly.")).toDF("doc_id", "text")
    val row = TextOps.qualityScore(TextOps.qualitySignals(df)).head()
    val get = (n: String) => row.getAs[Any](n)
    assert(get("n_tokens") == 7)
    assert(get("n_stopwords") == 2) // the, a ("on" is not in the profile)
    assert(get("stop_ratio") == 0.2857)
    val score = row.getAs[Double]("quality_score")
    assert(score >= 0.0 && score <= 1.0)
  }

  test("GopherCountersExpr ≡ the algebraic counter forms, byte for byte") {
    // edge fixtures: whitespace runs, unicode chars (code-point count),
    // '....' (ONE regex match + leftover dot), '#' runs, stopword
    // look-alikes ('The' ≠ 'the', 'thee' ≠ 'the')
    val docs = Seq(
      "the cat and the dog with a #tag",
      "café  über\tnaïve the",
      "dots.... and more......ok #",
      "The thee the. with of",
      "", "   \t", "123 456 #.#...",
      "a...b...c....d").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val t = col("text")
    val toks = TextOps.tokens(t)
    val stops = array(TextOps.GopherStopwords.map(lit): _*)
    val algebraic = docs.select(col("doc_id"),
        size(toks).cast("long").as("n_words"),
        TextOps.tokenCharSum(toks).as("sum_chars"),
        size(filter(toks, w => w.rlike("[A-Za-z]"))).cast("long").as("n_alpha"),
        size(filter(toks, w => array_contains(stops, w))).cast("long").as("n_stop"),
        regexp_count(t, lit("#|\\.\\.\\.")).cast("long").as("n_sym"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    val c = graft.functions.GopherText.counters(t, TextOps.GopherStopwords)
    val native = docs.select(col("doc_id"),
        c.getField("n_words"), c.getField("sum_chars"), c.getField("n_alpha"),
        c.getField("n_stop"), c.getField("n_sym"))
      .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
    algebraic.foreach { case (id, exp) =>
      assert(native(id) == exp, s"doc $id: native ${native(id)} vs algebraic $exp")
    }
  }

  test("tokenization is whitespace-robust across the signal operators") {
    // tabs / newlines / space runs must count LINGUISTIC words: the
    // messy and clean forms carry identical token streams
    val df = Seq(
      (1L, "the\tcat  sat\non a   mat, quietly."),
      (2L, "the cat sat on a mat, quietly.")).toDF("doc_id", "text")
    val q = TextOps.qualitySignals(df)
      .select("doc_id", "n_tokens", "n_stopwords", "stop_ratio", "mean_token_len")
      .collect().map(r => r.getLong(0) -> r).toMap
    Seq("n_tokens", "n_stopwords", "stop_ratio", "mean_token_len").foreach { c =>
      assert(q(1L).getAs[Any](c) == q(2L).getAs[Any](c), s"$c differs")
    }
    assert(q(1L).getAs[Int]("n_tokens") == 7)
    val g = TextOps.gopherSignals(df, minWords = 2).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(g(1L).getAs[Long]("n_words") == 7)
    // sum_chars = sum of token lengths (3+4+3+2+1+4+8), not length−(n−1)
    assert(g(1L).getAs[Double]("mean_word_len") == g(2L).getAs[Double]("mean_word_len"))
    val ts = TextOps.tokenStats(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r.getAs[Long]("n_ws_tokens")).toMap
    assert(ts(1L) == 7L && ts(2L) == 7L)
  }

  test("boilerplateSignals: corpus-df gram gate, ratio, keep threshold") {
    // bigram df with n=2: "a b" appears in docs 1,2,3,5 (df 4); every
    // other gram is unique (df 1). minDocFreq=2 ⇒ boiler = {"a b"}.
    val df = Seq(
      (1L, "a b x1"),    // grams {a b, b x1}: 1 of 2 boiler
      (2L, "a b x2"),    // grams {a b, b x2}: 1 of 2
      (3L, "a b a b"),   // distinct grams {a b, b a}: 1 of 2
      (4L, "solo"),      // < n tokens: no grams, kept
      (5L, "a b")        // grams {a b}: 1 of 1 — all boiler, dropped
    ).toDF("doc_id", "text")
    val out = TextOps.boilerplateSignals(df, n = 2, minDocFreq = 2,
        maxBoilerPct = 50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out.size == 5)
    Seq(1L, 2L, 3L).foreach { id =>
      assert(out(id).getAs[Long]("n_grams") == 2L)
      assert(out(id).getAs[Long]("n_boiler") == 1L)
      assert(out(id).getAs[Double]("boiler_ratio") == 0.5)
      assert(out(id).getAs[Boolean]("keep"))  // 100·1 ≤ 50·2
    }
    assert(out(4L).getAs[Long]("n_grams") == 0L &&
      out(4L).isNullAt(out(4L).fieldIndex("boiler_ratio")) &&
      out(4L).getAs[Boolean]("keep"))
    assert(out(5L).getAs[Double]("boiler_ratio") == 1.0 &&
      !out(5L).getAs[Boolean]("keep"))      // 100·1 > 50·1
    // result is invariant under input partitioning
    val re = TextOps.boilerplateSignals(df.repartition(7), n = 2,
      minDocFreq = 2, maxBoilerPct = 50)
    assert(re.collect().map(_.toSeq).toSet == out.values.map(_.toSeq).toSet)
  }

  test("topGramShare: dominant bigram, deterministic tiebreak, keep gate") {
    val df = Seq(
      (1L, "a b a b a"),    // bigrams: ab,ba,ab,ba — tie at 2, "a b" wins asc
      (2L, "x y z w"),      // all unique: top_count 1, share 1/3
      (3L, "go go go go"),  // "go go" ×3 of 3: share 1.0
      (4L, "solo")          // < 2 tokens: no grams, kept
    ).toDF("doc_id", "text")
    val out = TextOps.topGramShare(df).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(out(1L).getAs[String]("top_gram") == "a b" &&
      out(1L).getAs[Long]("top_count") == 2L &&
      out(1L).getAs[Double]("top_share") == 0.5 &&
      !out(1L).getAs[Boolean]("keep"))       // 100·2 > 20·4
    assert(out(2L).getAs[Long]("n_grams") == 3L &&
      out(2L).getAs[Long]("top_count") == 1L &&
      out(2L).getAs[Double]("top_share") == 0.3333 &&
      !out(2L).getAs[Boolean]("keep"))       // 100·1 > 20·3 — short docs fail
    assert(out(3L).getAs[Double]("top_share") == 1.0 &&
      !out(3L).getAs[Boolean]("keep"))
    assert(out(4L).getAs[Long]("n_grams") == 0L &&
      out(4L).getAs[String]("top_gram") == null &&
      out(4L).isNullAt(out(4L).fieldIndex("top_share")) &&
      out(4L).getAs[Boolean]("keep"))
    // a long clean doc passes: 25 distinct bigrams, top_count 1
    val clean = (1 to 26).map(i => s"w$i").mkString(" ")
    val ok = TextOps.topGramShare(Seq((9L, clean)).toDF("doc_id", "text"))
      .head()
    assert(ok.getAs[Boolean]("keep") && ok.getAs[Long]("n_grams") == 25L)
  }

  // -------------------------------------------------------- MultiModal

  test("decodeFeatures: deterministic stub decode via mapPartitions, typed output") {
    val df = Seq((7L, "payload-bytes")).toDF("doc_id", "text")
    val out = MultiModal.decodeFeatures(MultiModal.withPayload(df)).collect()
    assert(out.length == 1)
    val f = out.head
    assert(f.doc_id == 7L && f.n_bytes == 13L && f.channels == 3)
    // decode twice → identical features (determinism contract of the stub)
    val again = MultiModal.decodeFeatures(MultiModal.withPayload(df)).collect().head
    assert(f == again)
  }

  test("payloadMeta: column-only metadata agrees with stub geometry") {
    val df = Seq((7L, "payload-bytes")).toDF("doc_id", "text")
    val meta = MultiModal.payloadMeta(df).head()
    val decoded = MultiModal.decodeFeatures(MultiModal.withPayload(df)).collect().head
    assert(meta.getAs[Long]("n_bytes") == decoded.n_bytes)
    assert(meta.getAs[Int]("width") == decoded.width)
    assert(meta.getAs[Int]("height") == decoded.height)
    assert(meta.getAs[Int]("first_byte") == 'p'.toInt)
  }

  test("decodeFeatures plan has no shuffle (partition-local decode)") {
    val df = Seq((1L, "abc"), (2L, "def")).toDF("doc_id", "text")
    val plan = MultiModal.decodeFeatures(MultiModal.withPayload(df))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"decode must not shuffle:\n$plan")
  }

  test("ImageIODecoder: real PNG decode — geometry, bands, sample checksum") {
    val id = 42L
    val png = MultiModal.syntheticPng(id) // 42%31+2=13 × 42%23+2=21, RGB
    val f = MultiModal.ImageIODecoder.decode(id, png)
    assert(f.width == 13 && f.height == 21 && f.channels == 3)
    assert(f.n_bytes == png.length.toLong)
    // checksum folds DECODED samples, so it is a function of pixels
    // only: the same image re-encoded as BMP must checksum identically
    // even though the encoded bytes differ completely
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    assert(!java.util.Arrays.equals(bmp, png))
    val f2 = MultiModal.ImageIODecoder.decode(id, bmp)
    assert(f2.width == f.width && f2.height == f.height &&
      f2.channels == f.channels && f2.checksum == f.checksum,
      "pixel checksum must be encoding-invariant")
  }

  test("ImageIODecoder: grayscale PNG reports one band; corrupt payload throws") {
    val img = new java.awt.image.BufferedImage(
      5, 4, java.awt.image.BufferedImage.TYPE_BYTE_GRAY)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "png", bos)
    val f = MultiModal.ImageIODecoder.decode(9L, bos.toByteArray)
    assert(f.width == 5 && f.height == 4 && f.channels == 1)
    intercept[IllegalArgumentException] {
      MultiModal.ImageIODecoder.decode(10L, "not an image".getBytes)
    }
  }

  test("decodeFeatures with ImageIODecoder: real decode through the same plumbing") {
    val payloads = Seq(3L, 8L).map(id => (id, MultiModal.syntheticPng(id)))
      .toDF("doc_id", "payload")
    val out = MultiModal.decodeFeatures(
        payloads, decoder = MultiModal.ImageIODecoder)
      .collect().map(f => f.doc_id -> f).toMap
    assert(out(3L).width == 5 && out(3L).height == 5) // 3%31+2, 3%23+2
    assert(out(8L).width == 10 && out(8L).height == 10)
    assert(out.values.forall(_.channels == 3))
  }

  test("imageRoundTrip: decoded corner pixels match the deterministic fill; no shuffle") {
    val df = Seq(5L, 260L).toDF("doc_id") // 260 wraps the 256 color space
    val rt = MultiModal.imageRoundTrip(df)
    val plan = rt.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"round trip must not shuffle:\n$plan")
    val out = rt.collect().map(p => p.doc_id -> p).toMap
    assert(out(5L).width == 7 && out(5L).height == 7 && out(5L).channels == 3)
    assert(out(5L).r_first == 5 && out(5L).g_first == 15 && out(5L).b_first == 35)
    assert(out(260L).r_first == 4 && out(260L).g_first == 12 && out(260L).b_first == 28)
    out.values.foreach { p =>
      assert((p.r_first, p.g_first, p.b_first) == ((p.r_last, p.g_last, p.b_last)),
        "uniform fill: both corners decode to the same color")
    }
  }

  // ------------------------------------------------------------ tf-idf

  private val tfidfDocs = Seq(
    (1L, "apple apple banana common"),
    (2L, "banana cherry common"),
    (3L, "cherry cherry cherry common")
  ).toDF("doc_id", "text")

  test("tfidfTopK (log idf): rare repeated terms outrank corpus-wide ones") {
    val out = TextOps.tfidfTopK(tfidfDocs, "doc_id", "text", k = 1)
      .as[(Long, String, Long, Long, Double, Int)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: apple tf=2 df=1 beats common tf=1 df=3
    assert(out(1L)._2 == "apple" && out(1L)._3 == 2L && out(1L)._4 == 1L)
    assert(out(3L)._2 == "cherry")
    // 'common' appears in every doc: idf = ln(4/4)+1 = 1, score = tf
    val all = TextOps.tfidfTopK(tfidfDocs, "doc_id", "text", k = 10)
      .as[(Long, String, Long, Long, Double, Int)].collect()
    val common = all.filter(_._2 == "common")
    assert(common.forall(r => r._5 == r._3.toDouble))
  }

  test("tfidfTopK: rational and log idf agree on per-doc ranking here") {
    def ranks(logIdf: Boolean) =
      TextOps.tfidfTopK(tfidfDocs, "doc_id", "text", k = 10, logIdf = logIdf)
        .as[(Long, String, Long, Long, Double, Int)].collect()
        .map(r => (r._1, r._2) -> r._6).toMap
    assert(ranks(logIdf = true) == ranks(logIdf = false))
  }

  test("vocabOverlap: pairwise Jaccard over distinct group vocabularies") {
    val docs = Seq(
      ("s1", "alpha beta gamma"),
      ("s1", "alpha delta"),          // s1 vocab: alpha beta gamma delta
      ("s2", "alpha beta epsilon"),   // s2 vocab: alpha beta epsilon
      ("s3", "zeta eta")              // s3: disjoint
    ).toDF("source", "text")
    val out = TextOps.vocabOverlap(docs, "source", "text")
      .select("g_a", "g_b", "n_shared", "jaccard")
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // s1∩s2 = {alpha, beta} → J = 2/(4+3−2) = 0.4
    assert(out(("s1", "s2")) == ((2L, 0.4)))
    assert(!out.keySet.exists { case (a, b) => a == "s3" || b == "s3" })
  }

  test("tfidfTopK: corpus size N is in-plan (no driver-side count action)") {
    // the N aggregate must appear as a broadcast join, not be collected
    val plan = TextOps.tfidfTopK(tfidfDocs, "doc_id", "text", k = 3)
      .queryExecution.optimizedPlan.toString
    assert(plan.contains("__n_docs"), s"N must be a plan-side aggregate:\n$plan")
  }

  test("resizePlan: aspect-preserving integer box fit") {
    // len 100 → stub geometry w=101, h=221 (landscape in h): fit 224
    val out = MultiModal.resizePlan(
        Seq((1L, "x" * 100)).toDF("doc_id", "text"), target = 224)
      .as[(Long, Long, Long, Long, Long, Long, Long)].head()
    val (_, nb, wIn, hIn, wOut, hOut, nbOut) = out
    assert((nb, wIn, hIn) == ((100L, 101L, 221L)))
    assert(wOut == 101L * 224 / 221 && hOut == 224L)
    assert(nbOut == 100L * (wOut * hOut) / (101L * 221L))
  }

  test("frameSamplePlan: every stride-th frame with byte offsets; short payloads drop") {
    val out = MultiModal.frameSamplePlan(
        Seq((1L, "x" * 640), (2L, "y" * 300), (3L, "z" * 63))
          .toDF("doc_id", "text"), frameSize = 64, stride = 4)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(out == Set(
      (1L, 10L, 0L, 0L), (1L, 10L, 4L, 256L), (1L, 10L, 8L, 512L),
      (2L, 4L, 0L, 0L)))
  }

  // ------------------------------------------------------ gopher rules

  test("gopherSignals: each rule trips independently on a crafted doc") {
    def doc(words: Seq[String]) = words.mkString(" ")
    val good = doc(Seq("the", "and") ++ Seq.fill(58)("word"))
    val docs = Seq(
      1L -> good,                                               // all gates pass
      2L -> doc(Seq("the", "and") ++ Seq.fill(8)("word")),      // too few words
      3L -> doc(Seq.fill(60)("word")),                          // no stopwords
      4L -> doc(Seq("the", "and") ++ Seq.fill(58)("abcdefghijkl")), // words too long
      5L -> doc(Seq("the", "and") ++ Seq.fill(28)("word") ++
        Seq.fill(30)("123")),                                   // <80% alphabetic
      6L -> doc(Seq("the", "and") ++ Seq.fill(48)("word") ++
        Seq.fill(10)("#"))                                      // symbol-heavy
    ).toDF("doc_id", "text")
    val out = TextOps.gopherSignals(docs)
      .select("doc_id", "keep_words", "keep_mwl", "keep_alpha", "keep_stop",
        "keep_symbol", "keep")
      .as[(Long, Boolean, Boolean, Boolean, Boolean, Boolean, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, true, true, true, true, true, true)))
    assert(out(2L) == ((2L, false, true, true, true, true, false)))
    assert(out(3L) == ((3L, true, true, true, false, true, false)))
    assert(out(4L) == ((4L, true, false, true, true, true, false)))
    assert(out(5L) == ((5L, true, true, false, true, true, false)))
    assert(out(6L) == ((6L, true, true, true, true, false, false)))
  }

  test("gopherSignals: 4-dp integer-scaled display ratios") {
    val docs = Seq(1L -> (Seq("the", "and") ++ Seq.fill(58)("word")).mkString(" "))
      .toDF("doc_id", "text")
    val (mwl, fa) = TextOps.gopherSignals(docs)
      .select("mean_word_len", "frac_alpha").as[(Double, Double)].head()
    // Σchars = 3 + 3 + 58·4 = 238 → round(238·10⁴/60)/10⁴ = 3.9667
    assert(mwl == 3.9667 && fa == 1.0)
  }

  test("tokenStats: ws vs regex counts and type-token ratio") {
    val out = TextOps.tokenStats(
        Seq(1L -> "Hello, hello world! 42").toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Double)].head()
    // ws = [Hello, hello world! 42] (4); re = [hello hello world 42]
    // (4, 3 types) → ttr 0.75
    assert(out == ((1L, 4L, 4L, 3L, 0.75)))
  }

  test("lmSurprisal: exact bit surprisal from corpus bigram counts") {
    // corpus LM: (a,b)=3, (b,a)=1, (b,c)=1; prefixes a=3, b=2.
    // bits = floor(log2(c_prefix/c_bg)): (a,b)→0, (b,a)→1, (b,c)→1
    val out = TextOps.lmSurprisal(Seq(
        1L -> "a b a b c",  // bigrams (a,b)(b,a)(a,b)(b,c): 4, bits 2, rare 2
        2L -> "a b",        // (a,b): 1 bigram, 0 bits, not rare (count 3)
        3L -> "x"           // no bigrams → zeros, null ratios
      ).toDF("doc_id", "text"))
      .as[(Long, Long, Long, Long, Option[Double], Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 4L, 2L, 2L, Some(0.5), Some(0.5))))
    assert(out(2L) == ((2L, 1L, 0L, 0L, Some(0.0), Some(0.0))))
    assert(out(3L) == ((3L, 0L, 0L, 0L, None, None)))
  }

  test("dsirWeights: target-vs-source bit weights, OOV counted not smoothed") {
    // target LM: (a,b)=3 (b,a)=1 (b,c)=1, prefixes a=3 b=2
    // source LM: (a,b)=1 (b,c)=1 (c,c)=1 (z,z)=1, all prefixes 1
    // per-occurrence w = bits_s − bits_t: (a,b)→0−0=0, (b,c)→0−1=−1;
    // (b,a) OOV-source, (c,c)/(z,z) OOV-target
    val docs = Seq(
      (1L, "a b a b", true), (2L, "a b c", true),
      (3L, "a b c c", false), (4L, "z z", false)
    ).toDF("doc_id", "text", "is_en")
    val out = TextOps.dsirWeights(docs, col("is_en"))
      .as[(Long, Long, Long, Long, Long, Long, Option[Double])]
      .collect().map(r => r._1 -> r).toMap
    assert(out(1L) == ((1L, 3L, 2L, 0L, 1L, 0L, Some(0.0))))
    assert(out(2L) == ((2L, 2L, 2L, 0L, 0L, -1L, Some(-0.5))))
    assert(out(3L) == ((3L, 3L, 2L, 1L, 0L, -1L, Some(-0.5))))
    assert(out(4L) == ((4L, 1L, 0L, 1L, 0L, 0L, None)))
  }

  test("lmAndDsir ≡ lmSurprisal ⋈ dsirWeights, including a null-target row") {
    // doc 5's target flag is NULL: it must train neither the target
    // nor the source LM (standalone dsirWeights semantics) while its
    // bigrams still count in the total LM (standalone lmSurprisal
    // semantics) — the exact regime the fused single-pass LM's
    // nullif'd conditional counts have to reproduce
    val docs = Seq(
      (1L, "a b a b", Some(true)), (2L, "a b c", Some(true)),
      (3L, "a b c c", Some(false)), (4L, "z z", Some(false)),
      (5L, "a b q", None)
    ).toDF("doc_id", "text", "is_en")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val surprisal = rows(TextOps.lmSurprisal(docs))
    val dsir = rows(TextOps.dsirWeights(docs, col("is_en")))
    val fused = TextOps.lmAndDsir(docs, col("is_en"))
    assert(fused.columns.toSeq == Seq("doc_id", "n_bigrams", "sum_bits",
      "n_rare", "n_scored", "n_oov_target", "n_oov_source", "weight_bits",
      "bits_per_bigram", "rare_ratio", "mean_weight"))
    val byName = fused.collect().map { r =>
      r.getLong(0) -> fused.columns.zip(r.toSeq).toMap
    }.toMap
    for (id <- 1L to 5L) {
      val f = byName(id)
      val s = TextOps.lmSurprisal(docs).columns.drop(1).zip(surprisal(id)).toMap
      val d = TextOps.dsirWeights(docs, col("is_en")).columns.drop(1).zip(dsir(id)).toMap
      (s ++ d).foreach { case (c, v) =>
        assert(f(c) == v, s"doc $id column $c: fused ${f(c)} != standalone $v")
      }
    }
  }

  private def dhashOf(df: org.apache.spark.sql.DataFrame) =
    MultiModal.imageDHash(df).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("imageDHash: brightness shift is invariant, scene change is not") {
    // ids 16..23 share scene group 2 (DIV 8) and differ only in the
    // id%8 brightness shift; none of 16..23 is hit by the %5 pixel
    // bump's same-group collision except 20 (bump moves ≤2 bits)
    val df = Seq(16L, 17L, 18L, 19L, 21L, 22L, 23L, 80L).toDF("doc_id")
    val hashes = dhashOf(MultiModal.withScenePayload(df))
    val group2 = Seq(16L, 17L, 18L, 19L, 21L, 22L, 23L).map(hashes)
    assert(group2.distinct.size == 1,
      "constant brightness shift must not change a difference hash")
    assert(hashes(80L) != group2.head, "different scenes must hash apart")
    // the bumped doc 20 stays within banding reach of its group
    val bumped = dhashOf(MultiModal.withScenePayload(Seq(20L).toDF("doc_id")))(20L)
    assert(java.lang.Long.bitCount(bumped ^ group2.head) <= 2 &&
      bumped != group2.head, "pixel bump must flip 1-2 bits, not zero, not many")
  }

  test("imageDHash: block-average downsample makes a 2x upscale hash-identical") {
    val base = MultiModal.syntheticScenePng(7L)
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(base))
    val big = new java.awt.image.BufferedImage(
      18, 16, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 16; x <- 0 until 18)
      big.setRGB(x, y, img.getRGB(x / 2, y / 2))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(big, "png", bos)
    val df = Seq((1L, base), (2L, bos.toByteArray)).toDF("doc_id", "payload")
    val hashes = dhashOf(df)
    assert(hashes(1L) == hashes(2L),
      "2x nearest-neighbor upscale block-averages to the same 9x8 grid")
  }

  test("sourceOverlap: hand-computed shared-gram counts and Jaccard") {
    val base = "alpha beta gamma delta epsilon zeta" // grams: 2 distinct 5-grams
    val docs = Seq(
      (1L, "web", base),                       // web grams = 2
      (2L, "web", base),                       // duplicate adds nothing (distinct)
      (3L, "books", base + " eta"),            // books ⊇ web's 2 grams + 1 more
      (4L, "wiki", "one two three four"),      // too short: no grams
      (5L, "news", "totally different words here now ok")
    ).toDF("doc_id", "source", "text")
    val out = TextOps.sourceOverlap(docs).collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toMap
    // only (books, web) share: 2 shared, sizes 3 and 2 → J = 2/3
    assert(out.keySet == Set(("books", "web")))
    assert(out(("books", "web")) == ((2L, 3L, 2L, 0.6667)))
  }

  test("bm25TopK: rarity and length normalization rank as Okapi says") {
    val docs = Seq(
      (1L, "data data data data"),            // high tf, short
      (2L, "data " + ("filler " * 40)),       // tf 1, long → length-penalized
      (3L, "vector data"),                    // rare term + common term
      (4L, "filler filler filler"),           // no query terms
      (5L, "data")                            // tf 1, shortest
    ).toDF("doc_id", "text")
    val out = TextOps.bm25TopK(docs, Seq("data", "vector"), k = 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    val byDoc = out.map(t => t._1 -> t).toMap
    assert(!byDoc.contains(4L), "docs with no query terms must not rank")
    assert(byDoc(3L)._2 == 2L && out.forall(_._2 >= 1L))
    // doc 3 holds the rarest term (vector: df=1) plus data → top score
    assert(out.head._1 == 3L, s"rarest-term doc must lead: ${out.toSeq}")
    // same tf=1 of the same term: the 40-filler doc scores below the
    // 1-token doc (Okapi length normalization)
    assert(byDoc(2L)._3 < byDoc(5L)._3)
    // scores descend (doc-id tiebreak ascends)
    assert(out.sliding(2).forall { case Array(a, b) =>
      a._3 > b._3 || (a._3 == b._3 && a._1 < b._1) })
  }

  test("audioFingerprint: same (frames, k) class ⇒ same hash, else apart") {
    // ids 2 and 79: 2%7=2,2%11=2; 79%7=2,79%11=2 → identical synthesis
    // → identical fingerprint; id 3 differs in both → different
    val fp = MultiModal.audioFingerprint(Seq(2L, 79L, 3L).toDF("doc_id"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(fp(2L) == fp(79L), "identical synthesis params must collide")
    assert(fp(2L) != fp(3L), "different sawtooth must hash apart")
  }

  test("screenBoilerplate with self-trained index ≡ boilerplateSignals") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val index = TextOps.boilerplateIndex(docs, n = 3, minDocFreq = 5,
      maxBoilerPct = 60)
    val screened = TextOps.screenBoilerplate(docs, index)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val batch = TextOps.boilerplateSignals(docs)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    assert(screened == batch,
      "decoupled train+screen must reproduce the fused corpus statistic")
  }

  test("fertility roll-up: per-lang tokens/word under a hand-trained BPE model") {
    import org.apache.spark.sql.functions.{col, explode, length, round, sum, count, lit}
    // vocab: "aa"×2 (lang a), "ab"×1 (lang b); one merge fuses (a,a),
    // so "aa" prices at 1 token and "ab" stays at 2
    val docs = Seq((1L, "aa aa", "a"), (2L, "ab", "b")).toDF("doc_id", "text", "lang")
    val model = Bpe.trainMerges(docs, "text", nMerges = 1)
      .orderBy("step").collect().map(r => (r.getString(1), r.getString(2))).toSeq
    assert(model == Seq(("a", "a")))
    val seg = Bpe.segment(docs, "text", model).toDF()
    val out = docs
      .select(col("lang"), explode(TextOps.regexTokens(col("text"))).as("word"))
      .join(seg.select("word", "n_tokens"), "word")
      .groupBy("lang")
      .agg(count(lit(1)).as("n_words"),
        sum(length(col("word"))).cast("long").as("n_chars"),
        sum("n_tokens").as("n_bpe_tokens"))
      .select(col("lang"), col("n_words"), col("n_chars"), col("n_bpe_tokens"),
        (round(col("n_bpe_tokens") * 10000.0 / col("n_words")) / 1e4).as("f"),
        (round(col("n_chars") * 10000.0 / col("n_bpe_tokens")) / 1e4).as("cpt"))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(out("a") == ((2L, 4L, 2L, 1.0, 2.0)), s"lang a: ${out("a")}")
    assert(out("b") == ((1L, 2L, 2L, 2.0, 1.0)), s"lang b: ${out("b")}")
  }

  test("scrubRareTokens: under-floor tokens mask to <unk>, order preserved") {
    val docs = Seq(
      (1L, "the serial XK42-99 of the device"),
      (2L, "the device works and the device helps"),
      (3L, "")
    ).toDF("doc_id", "text")
    // counts: the=4, device=3, serial/XK42-99/of=1, works/and/helps=1
    val out = TextOps.scrubRareTokens(docs, minCount = 3)
      .as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(out(0) == ((1L, 6L, 3L, "the <unk> <unk> <unk> the device")))
    assert(out(1) == ((2L, 7L, 3L, "the device <unk> <unk> the device <unk>")))
    assert(out(2) == ((3L, 0L, 0L, "")))
  }

  test("screenSurprisal with self-trained index ≡ lmSurprisal, zero OOV") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select("doc_id", "text")
    val index = TextOps.lmIndex(docs)
    val screened = TextOps.screenSurprisal(docs, index).collect()
      .map(r => r.getLong(0) -> r).toMap
    val batch = TextOps.lmSurprisal(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(screened.keySet == batch.keySet)
    for ((id, s) <- screened) {
      val b = batch(id)
      // self-trained: every bigram is in the LM by construction
      assert(s.getAs[Long]("n_oov") == 0L, s"doc $id has OOV")
      assert(s.getAs[Long]("n_scored") == s.getAs[Long]("n_bigrams"))
      for (c <- Seq("n_bigrams", "sum_bits", "n_rare"))
        assert(s.getAs[Long](c) == b.getAs[Long](c), s"doc $id col $c")
      for (c <- Seq("bits_per_bigram", "rare_ratio"))
        assert(s.getAs[Any](c) == b.getAs[Any](c), s"doc $id col $c")
    }
  }

  test("screenSurprisal: unknown bigrams count as OOV, ratios over scored only") {
    val reference = Seq((1L, "alpha beta alpha beta alpha gamma")).toDF("doc_id", "text")
    val index = TextOps.lmIndex(reference)
    // "alpha beta" known (c_bg=2), "zzz yyy" / "beta zzz" / "yyy alpha" unknown
    val out = TextOps.screenSurprisal(
        Seq((9L, "alpha beta zzz yyy alpha")).toDF("doc_id", "text"), index)
      .collect().head
    assert(out.getAs[Long]("n_bigrams") == 4L)
    assert(out.getAs[Long]("n_scored") == 1L)
    assert(out.getAs[Long]("n_oov") == 3L)
    // c_prefix(alpha)=3, c_bg(alpha beta)=2 → bits = floor(log2(3/2)) = 0
    assert(out.getAs[Long]("sum_bits") == 0L)
    assert(out.getAs[Double]("bits_per_bigram") == 0.0)
  }

  test("imageResizeReal: NN resample hands back the scene arithmetic at mapped coords") {
    val df = Seq(0L, 7L, 23L).toDF("doc_id")
    val out = MultiModal.imageResizeReal(
        MultiModal.withScenePayload(df)).collect()
      .map(r => r.doc_id -> r).toMap
    for (id <- Seq(0L, 7L, 23L)) {
      val r = out(id)
      assert(r.w_in == 9 && r.h_in == 8 && r.w_out == 4 && r.h_out == 4)
      // source index xo*9/4, yo*8/4 → corners at (0,0),(6,0),(0,6),(6,6)
      assert(r.tl == MultiModal.sceneGray(id, 0, 0))
      assert(r.tr == MultiModal.sceneGray(id, 6, 0))
      assert(r.bl == MultiModal.sceneGray(id, 0, 6))
      assert(r.br == MultiModal.sceneGray(id, 6, 6))
      val expectSum = (for (yo <- 0 until 4; xo <- 0 until 4)
        yield MultiModal.sceneGray(id, xo * 9 / 4, yo * 8 / 4).toLong).sum
      assert(r.sum_samples == expectSum)
    }
  }

  test("audioRoundTrip: real WAV decode hands back the synthesis arithmetic") {
    val df = Seq(0L, 3L, 13L).toDF("doc_id")
    val out = MultiModal.audioRoundTrip(df).collect()
      .map(m => m.doc_id -> m).toMap
    val m13 = out(13L) // rate 8000+3*2000, frames 400+6*100, k 5
    assert(m13.sample_rate == 14000 && m13.n_frames == 1000 &&
      m13.channels == 1 && m13.bits == 16)
    assert(m13.duration_ms == 1000L * 1000 / 14000)
    assert(m13.first_sample == -1024)
    assert(m13.last_sample == ((999 * 5) % 2048) - 1024)
    assert(m13.sum_samples ==
      (0 until 1000).map(i => ((i * 5) % 2048) - 1024L).sum)
    // a truncated payload must throw, not fabricate
    val wav = MultiModal.syntheticWav(3L)
    intercept[Exception] {
      Seq((3L, wav.take(20))).toDF("doc_id", "payload")
        .as[(Long, Array[Byte])]
      MultiModal.audioRoundTrip(Seq(99L).toDF("doc_id")) // shape check only
      javax.sound.sampled.AudioSystem.getAudioInputStream(
        new java.io.ByteArrayInputStream(wav.take(20)))
    }
  }

  test("hammingPairs maxBucket drops the hot bucket, keeps the tail") {
    // 12 copies of one hash + one near pair (hamming 1)
    val rows = (1L to 12L).map(id => (id, 0x0f0f0f0fL)) ++
      Seq((21L, 0x7000L), (22L, 0x7001L))
    val df = rows.toDF("doc_id", "phash")
    val unguarded = Dedup.hammingPairs(df, "doc_id", "phash")
    assert(unguarded.count() == 66 + 1) // C(12,2) hot + 1 tail pair
    val guarded = Dedup.hammingPairs(df, "doc_id", "phash",
      maxHamming = 3, pieces = 6, maxBucket = 5)
    assert(guarded.collect().map(r => (r.getLong(0), r.getLong(1))).toSet ==
      Set((21L, 22L)), "guard must drop exactly the hot bucket's pairs")
  }
}
