package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Deterministic synthetic-scale corpus generator (r19 VERDICT "Next
  * round" #3): the driver's testdata tops out at sf0.1 (5,000 docs,
  * ~1.5M chars), where the suffix-rank family is bounded by its 38–45
  * Spark-job scheduling floor rather than by data — the
  * data-dominated regime the 100 TB argument rests on has never been
  * MEASURED. This main writes an sf-dir-shaped directory whose
  * `documents` table carries ~10× the tokens (default 50,000 docs,
  * ~14.5M chars) so the bench can commit a row at the synthetic scale
  * (`SPARK_GRAFT_BENCH_ONLY=<text families> SPARK_GRAFT_BENCH_RECORD=1
  * SPARK_GRAFT_SF_DIR=<outDir>`) and the per-query `jobs`/time deltas
  * separate per-job scheduling cost from data cost from the record
  * alone.
  *
  * Shape mirrors the driver's sf0.1 `documents` so every catalog
  * query stays semantically valid: same schema (doc_id, text, lang,
  * source, n_chars), the same 20-source × 5-lang layout, a ~30-word
  * vocabulary of space-separated tokens, ~300 chars/doc. Three
  * duplication regimes are injected deliberately:
  *   - ~3% EXACT duplicates of an earlier doc (the exact/fingerprint
  *     dedup families' groups — small groups, far below every
  *     `maxBucket` occupancy guard);
  *   - ~22% of docs splice ONE shared span (10–30 words, drawn from a
  *     200-span pool, each span recurring ~55×) at a random offset —
  *     the cross-doc long-repeat structure whose suffix-rank group
  *     sizes GROW with the corpus, i.e. the regime where the
  *     prefix-doubling ladder's cost is data, not job launches;
  *   - the rest fresh random text (the unique tail).
  *
  * Every OTHER table (embeddings included) is byte-copied from the
  * base sf dir: the synthetic row isolates the documents axis, and the
  * copied tables keep the bench's 10-table data fingerprint computable
  * — the fingerprint differs from sf0.1's (documents row count), so
  * the committed row can never silently pair with a real-sf row in
  * any cross-run comparison.
  *
  * Fully deterministic: fixed seed (42), driver-side sequential
  * generation, single-file parquet per table. Usage:
  * {{{ runMain graft.SynthCorpus [outDir] [baseSfDir] [nDocs] }}}
  */
object SynthCorpus {

  private val vocab = Vector(
    "batch", "part", "spark", "line", "column", "order", "small", "sort",
    "fast", "value", "scan", "a", "hash", "slow", "group", "agg", "filter",
    "query", "big", "key", "window", "row", "table", "stream", "merge",
    "data", "join", "shuffle", "plan", "cache", "disk")

  /** The documents frame: deterministic given (seed fixed, nDocs). */
  private[graft] def synthDocs(spark: SparkSession, nDocs: Int): DataFrame = {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    // shared-span pool: each span recurs ~nDocs*0.22/200 times, so
    // repeat-group sizes scale linearly with the corpus — the
    // data-dominated regime — while staying far below quadratic blowup
    val spans = Vector.fill(200)(
      (0 until (10 + rnd.nextInt(21)))
        .map(_ => vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val texts = new scala.collection.mutable.ArrayBuffer[String]
    val rows = (0 until nDocs).map { i =>
      val roll = rnd.nextInt(100)
      val t =
        if (roll < 3 && texts.nonEmpty) texts(rnd.nextInt(texts.size))
        else {
          val base = Vector.fill(30 + rnd.nextInt(40))(
            vocab(rnd.nextInt(vocab.size)))
          val words =
            if (roll < 25) {
              val s = spans(rnd.nextInt(spans.size))
              val at = rnd.nextInt(base.size + 1)
              (base.take(at) :+ s) ++ base.drop(at)
            } else base
          val x = words.mkString(" ")
          texts += x
          x
        }
      val lr = rnd.nextInt(100)
      val lang =
        if (lr < 41) "en" else if (lr < 56) "de" else if (lr < 71) "es"
        else if (lr < 86) "fr" else "zh"
      (i.toLong, t, lang, s"src${i % 20}", t.length.toLong)
    }
    rows.toDF("doc_id", "text", "lang", "source", "n_chars")
  }

  /** Single-FILE parquet at `$dir/$name.parquet` — the layout
    * [[Tables.path]] expects. */
  private def writeTable(df: DataFrame, dir: String, name: String): Unit = {
    val tmp = new java.io.File(s"$dir/__tmp_$name")
    df.coalesce(1).write.mode("overwrite").parquet(tmp.getPath)
    val part = tmp.listFiles().find(_.getName.endsWith(".parquet"))
      .getOrElse(throw new IllegalStateException(s"no part file for $name"))
    java.nio.file.Files.move(part.toPath,
      java.nio.file.Paths.get(s"$dir/$name.parquet"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    tmp.listFiles().foreach(_.delete()); tmp.delete(); ()
  }

  def main(args: Array[String]): Unit = {
    val outDir = args.headOption.getOrElse("/tmp/graft_sf_synth10x")
    val baseDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val nDocs = if (args.length > 2) args(2).toInt else 50000
    new java.io.File(outDir).mkdirs()
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-synth")
    spark.sparkContext.setLogLevel("WARN")
    // every non-documents table byte-copies from the base sf dir
    Seq("region", "nation", "customer", "supplier", "part", "orders",
        "lineitem", "events", "embeddings").foreach { t =>
      java.nio.file.Files.copy(
        java.nio.file.Paths.get(s"$baseDir/$t.parquet"),
        java.nio.file.Paths.get(s"$outDir/$t.parquet"),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    }
    val docs = synthDocs(spark, nDocs)
    writeTable(docs, outDir, "documents")
    val chars = spark.read.parquet(s"$outDir/documents.parquet")
      .agg(org.apache.spark.sql.functions.sum("n_chars")).head.getLong(0)
    println(s"""{"synth_dir":"$outDir","docs":$nDocs,"chars":$chars}""")
    spark.stop()
  }
}
