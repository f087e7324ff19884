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
    "vocab_bpe_segment", "text_tokens_bpe")
  // window_yoy reads orders, not events → out of the generated scope;
  // the daily-series windows key on observation_day (the reference's
  // FRED within-one-month series shape), so the fuzz time axis stays
  // inside one calendar month — still 5 weekly cohort offsets
  private val eventQueries = Seq(
    "fred_monthly_agg", "fred_daily_agg", "window_mom",
    "window_locf", "window_sessionize", "window_tumbling",
    "events_transitions", "events_retention", "events_retention_weekly",
    "events_funnel")

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
      (i.toLong, ts, user, etype, value, s"p${rnd.nextInt(5)}")
    }
    rows.toDF("event_id", "ts", "user_id", "event_type", "value", "props")
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
    val outDir = s"$dir/out"
    Verify.dump(spark, dir, outDir, Some((docQueries ++ eventQueries).toSet))
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
    assert(passes == docQueries.size + eventQueries.size,
      s"seed $seed: expected ${docQueries.size + eventQueries.size} " +
        s"hash-checked queries, saw $passes:\n$report")
  }

  for (seed <- 1 to 10)
    fuzzTest(s"differential fuzz seed $seed: catalog subset ≡ DuckDB on adversarial data") {
      runSeed(seed)
    }
}
