package graft
import org.apache.spark.sql.SparkSession

/** Benchmark main: runs the catalog on SPARK_GRAFT_SF_DIR and prints
  * three JSON lines — plan fingerprints, per-query spread, then the
  * timings line LAST (the driver's capture keeps the TAIL of stdout,
  * and r4/r5 proved truncation eats the first line; the timings line
  * is the one that must survive). All lines are also written to
  * `bench_out.json`, and every run appends one row to
  * `bench_history.jsonl` so rounds compare median-to-median.
  *
  * Protocol (r8 VERDICT "What's missing" #1 — single-run numbers made
  * real regressions indistinguishable from host noise):
  *   1. one UNMEASURED warm-up pass over the whole set (JVM/codegen
  *      warmup and page cache aren't billed to any query);
  *   2. three measured runs per query; the reported number is the
  *      MEDIAN (this host shows sporadic 4-10× single-run spikes from
  *      background load — the median measures the plan, not the
  *      scheduler's bad luck);
  *   3. per-query max/min spread is reported on its own line and in
  *      the history file, so a "regression" with spread ≈ its delta
  *      is diagnosable as noise without re-running;
  *   4. any query whose spread exceeds SPARK_GRAFT_BENCH_RERUN_SPREAD
  *      (default 1.5×) is automatically re-measured for one extra
  *      round and its median recomputed over all samples, so a host-
  *      noise window that ate two of three runs cannot contaminate
  *      the committed record (r12 VERDICT #3); re-measured names are
  *      listed under `reran` on the spread line;
  *   5. CROSS-RUN integrity (r13 VERDICT #2 — a noise window that
  *      outlasts the whole bench defeats #4): each fresh median is
  *      checked against the latest history row with the same cpus, sf,
  *      data fingerprint AND per-query plan hash. If > 25% of the
  *      comparable queries inflate beyond 1.5×, the inflated set gets
  *      one more measured round (medians recompute over all samples);
  *      persistent inflation marks the record `"suspect":true` with
  *      the inflated names and the baseline row's ts — the record
  *      indicts itself instead of waiting for post-hoc adjudication;
  *   6. PER-QUERY gross-inflation guard (r14 VERDICT #1 — the 25%
  *      fraction test let ~30 s of phantom time ship `suspect:false`
  *      because two gross outliers carried most of it): ANY same-plan
  *      query whose fresh median exceeds SPARK_GRAFT_BENCH_GROSS
  *      (default 3×) its history median, OR whose fresh median
  *      exceeds history by more than max(SPARK_GRAFT_BENCH_ABS
  *      seconds (default 1.5), 0.5 × history) — the ABSOLUTE-seconds
  *      term (r15 VERDICT #1: a pure ratio gate structurally
  *      under-weighs expensive queries — 2.6× on an 8 s query is
  *      +13 s of phantom, more than every sub-3× flag combined, and
  *      shipped unmarked) — is re-measured for one extra round
  *      regardless of the whole-record fraction, and queries still
  *      gross after the extra round are listed per-query in the
  *      record's `inflated` field even when `suspect` stays false —
  *      the fraction test catches broad noise windows, this guard
  *      catches the outliers that carry the phantom seconds. A check
  *      that fails to run says so (`check_errored`) instead of
  *      committing an unmarked record.
  *   7. JOBS PER QUERY (r15 VERDICT #6): each history row carries a
  *      `jobs` map — Spark jobs launched per measured run, from a
  *      SparkListener snapshotted around each query's runs like the
  *      shuffle counters — so scheduling-floor claims ("~36 jobs ×
  *      ~230 ms" for the suffix family) are record-backed, and a
  *      future diff can separate per-job scheduling cost from data
  *      cost without re-running anything.
  *
  * Queries in [[SparkEntry.verifyOnly]] (intentionally non-production
  * anchor plans) are skipped and listed under `excluded`; queries in
  * [[SparkEntry.benchForm]] (gate composites embedding their own
  * verification twin) are benched in their production shape and listed
  * under `bench_forms` — the bench total reflects production plans
  * only.
  *
  * Each query is forced end-to-end with a `noop`-format write so the
  * timing covers the full plan (a bare `count()` lets Catalyst prune
  * projections and would under-time expression-heavy queries).
  *
  * Alongside each timing the output carries a fingerprint of the
  * query's canonicalized optimized plan (`plans` key): when a number
  * moves between rounds, an unchanged hash proves the plan didn't —
  * the delta is scheduler luck, not a regression.
  *
  * CPU pinning (r9 VERDICT #5): the same code measured at local[4] and
  * local[32] differs up to 2.7× on tiny windowed frames with
  * byte-identical plans — pure task-scheduling overhead. Every record
  * therefore STATES its cpu count (`cpus` in the timings line and in
  * each history row), and round-over-round comparison is only valid
  * between same-cpus, same-sf rows — `tools/bench_diff.py` enforces
  * this by diffing against the latest matching row, not merely the
  * previous one. The committed record runs at whatever SPARK_GRAFT_CPUS
  * the driver pins (local[32] since r9); local iteration at other cpu
  * counts is fine because the history row carries the config.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "3").toInt
    val spark = GraftSession.local(cpus, appName = "graft-bench")
    spark.sparkContext.setLogLevel("WARN")

    // gate composites that embed their verification twin are benched in
    // their production shape (see SparkEntry.benchForm)
    def planFor(name: String) =
      SparkEntry.benchForm.getOrElse(name, SparkEntry.queries(name))

    def runOnce(name: String): Double = {
      val t0 = System.nanoTime()
      try planFor(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}"); return -1.0
      }
      (System.nanoTime() - t0) / 1e9
    }

    // local-iteration subset (comma-separated names): when set, the
    // run measures only those queries and SKIPS bench_out/history
    // writes — committed history rows always cover the whole set, so
    // rounds stay median-to-median comparable
    val only = sys.env.get("SPARK_GRAFT_BENCH_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filterNot(SparkEntry.verifyOnly)
      .filter(n => only.forall(_.contains(n)))

    // JVM + codegen + page-cache warm-up: one pass over the whole set,
    // not billed (r8's single flagship warm-up left the first minhash
    // query paying everyone's classloading)
    try SparkEntry.entry(spark).write.format("noop").mode("overwrite").save()
    catch { case _: Throwable => () }
    names.foreach(runOnce)

    // Shuffle-bytes observability (r10 VERDICT #8): plan hashes catch
    // SHAPE changes but not VOLUME changes — "same plan, 10× bytes
    // moved" was invisible. A listener accumulates stage-level shuffle
    // read/write bytes; per query the bench snapshots the counters
    // around its measured runs (listener-bus flushed at both edges so
    // async delivery can't bill one query's stages to the next) and
    // records the per-run average — volumes are plan-deterministic, so
    // the average IS the per-run number.
    val shuffleRead = new java.util.concurrent.atomic.AtomicLong
    val shuffleWrite = new java.util.concurrent.atomic.AtomicLong
    // job counter (r15 VERDICT #6): jobs/query is the scheduling-floor
    // axis — at small SFs multi-job operators (the suffix ladders) are
    // bounded by jobs × per-job launch cost, not data, and the record
    // must let a reader verify that decomposition
    val jobCount = new java.util.concurrent.atomic.AtomicLong
    spark.sparkContext.addSparkListener(
      new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = s.stageInfo.taskMetrics
          if (m != null) {
            shuffleRead.addAndGet(m.shuffleReadMetrics.totalBytesRead)
            shuffleWrite.addAndGet(m.shuffleWriteMetrics.bytesWritten)
          }
        }
        override def onJobStart(
            j: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
          jobCount.incrementAndGet(); ()
        }
      })
    def flushListeners(): Unit =
      try org.apache.spark.GraftListenerFlush.flush(spark.sparkContext)
      catch { case _: Throwable => () }

    // measured: `runs` samples per query → median + max/min spread.
    // AUTO-RERUN (r12 VERDICT "What's wrong" #3): median-of-3 defends
    // against ONE outlier, but a host-noise window long enough to eat
    // two of three runs contaminates the committed median with the
    // plan and shuffle bytes unchanged (~10 s of the r12 record). Any
    // query whose max/min spread exceeds the threshold gets ONE extra
    // round of `runs` samples and its median recomputes over ALL
    // samples — a noise window must now outlast 2×runs measured runs
    // to survive into the record. Bounded: one rerun per query, and
    // queries with stable spreads pay nothing.
    val rerunSpread =
      sys.env.getOrElse("SPARK_GRAFT_BENCH_RERUN_SPREAD", "1.5").toDouble
    val reran = scala.collection.mutable.ArrayBuffer.empty[String]
    val samplesWithShuffle: Seq[(String, Seq[Double], Long, Long, Long)] =
      names.map { n =>
        flushListeners()
        val (r0, w0, j0) = (shuffleRead.get, shuffleWrite.get, jobCount.get)
        val first = Seq.fill(runs)(runOnce(n))
        val xs =
          if (first.forall(_ > 0) && first.max / first.min > rerunSpread) {
            reran += n
            first ++ Seq.fill(runs)(runOnce(n))
          } else first
        flushListeners()
        (n, xs, (shuffleRead.get - r0) / xs.size,
          (shuffleWrite.get - w0) / xs.size,
          (jobCount.get - j0) / xs.size)
      }
    val samples: Seq[(String, Seq[Double])] =
      samplesWithShuffle.map { case (n, xs, _, _, _) => n -> xs }
    def median(xs: Seq[Double]): Double =
      if (xs.exists(_ < 0)) -1.0 else xs.sorted.apply(xs.size / 2)
    def spread(xs: Seq[Double]): Double =
      if (xs.exists(_ <= 0)) -1.0
      else math.round(xs.max / xs.min * 100.0) / 100.0
    val medians = samples.map { case (n, xs) => n -> median(xs) }
    val spreads = samples.map { case (n, xs) => n -> spread(xs) }

    // 48-bit md5 of the optimized plan's NODE TREE (indent + node kind
    // per line, full text for leaf relations). Expression bodies are
    // deliberately excluded: canonicalization normalizes most exprIds,
    // but RewriteDistinctAggregates assigns its Expand group ids in
    // JVM-history-dependent order — measured: profile_columns_approx's
    // full-text hash changed with which queries ran BEFORE it, turning
    // the noise discriminator into a false-positive source. The tree
    // still moves on join reorders, added/removed operators, and lost
    // column pruning (leaf lines keep their schema); it deliberately
    // does NOT move on expression-level rewrites, which the oracle
    // gate owns anyway.
    def planHash(name: String): String =
      try {
        val canon = planFor(name)(spark, sfDir)
          .queryExecution.optimizedPlan.canonicalized.toString
          .linesIterator.map { line =>
            val masked = line
              .replaceAll("\\$\\$Lambda[$/][^,\\s)]*", "<lambda>")
              .replaceAll("@[0-9a-f]{6,}", "@id")
              .replaceAll("#\\d+", "#n")
            val prefixLen = masked.segmentLength(
              c => c == ' ' || c == ':' || c == '+' || c == '-', 0)
            val t = masked.substring(prefixLen)
            if (t.startsWith("Relation") || t.startsWith("LogicalRDD")) masked
            else {
              val kind = t.takeWhile(c => c.isLetterOrDigit || c == '!' || c == '*')
              // join TYPE is structural (Inner vs LeftAnti is a
              // different plan, not a different expression)
              val joinType = if (kind.endsWith("Join") && t.contains(" "))
                " " + t.drop(kind.length + 1).takeWhile(_.isLetterOrDigit)
              else ""
              masked.substring(0, prefixLen) + kind + joinType
            }
          }.mkString("\n")
        java.security.MessageDigest.getInstance("MD5")
          .digest(canon.getBytes("UTF-8")).take(6).map("%02x".format(_)).mkString
      } catch { case _: Throwable => "err" }

    // Data fingerprint: per-table row counts straight from the parquet
    // FOOTERS (no scan). The r10 driver regenerated sf0.1 with 10×
    // documents and 4× embeddings under the SAME path — every
    // path-keyed round-over-round diff silently compared different
    // data. Each record now carries what it actually measured, and
    // tools/bench_diff.py refuses to diff across differing counts.
    def tableRows(table: String): Long =
      try {
        import scala.jdk.CollectionConverters._
        val p = new org.apache.hadoop.fs.Path(Tables.path(sfDir, table))
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(p, spark.sparkContext.hadoopConfiguration)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try r.getFooter.getBlocks.asScala.map(_.getRowCount.toLong).sum
        finally r.close()
      } catch { case _: Throwable => -1L }
    // A failed footer read must make the fingerprint NON-comparable,
    // not equal (r10 ADVICE #1: a shared -1 sentinel let two broken
    // reads fingerprint identically and silently resume cross-data
    // diffs). Any failure drops the field; bench_diff treats
    // missing-vs-present as incomparable.
    val tableCounts = Seq("documents", "embeddings", "events", "lineitem",
        "orders", "customer", "part", "supplier", "nation", "region")
      .map(t => t -> tableRows(t))
    val dataField: String =
      if (tableCounts.exists(_._2 < 0)) ""
      else tableCounts.map { case (t, n) => "\"" + t + "\":" + n }
        .mkString("\"data\":{", ",", "},")

    val planHashes: Map[String, String] = names.map(n => n -> planHash(n)).toMap

    // CROSS-RUN INTEGRITY (r13 VERDICT "What's wrong" #1 / next-round
    // #2): the within-run auto-rerun cannot defeat a host-noise window
    // that outlasts the whole bench — extra samples from the same
    // window reproduce the same inflation (r13 committed ~25 s of
    // phantom regression with plan hashes and shuffle bytes
    // byte-identical to the clean row). The defense must be
    // CROSS-RUN: compare each fresh median against the latest history
    // row with the same cpus, same sf, same data fingerprint, and the
    // same per-query plan hash (same plan + same data moved ⇒ the
    // time should match within noise). If more than 25% of the
    // comparable queries inflate beyond 1.5×, the whole-record noise
    // hypothesis is live: the inflated set is re-measured once more
    // (medians recompute over ALL samples), and if the inflation
    // persists the committed record carries an explicit
    // `"suspect":true` marker + the inflated names + the baseline row
    // ts — the driver and the next round can see the record indicts
    // itself instead of adjudicating after the fact.
    // a malformed override must not abort the run AFTER every measured
    // round already happened — fall back to the default and keep the
    // record (the check still runs, at 3×)
    val grossFactor = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_GROSS", "3.0").toDouble)
      .getOrElse(3.0)
    // absolute-seconds floor for the per-query guard (r15 VERDICT #1)
    val absFloorSecs = scala.util.Try(
      sys.env.getOrElse("SPARK_GRAFT_BENCH_ABS", "1.5").toDouble)
      .getOrElse(1.5)
    var extraSamples: Map[String, Seq[Double]] = Map.empty
    var suspectInfo: Option[(Long, Seq[String])] = None
    var persistGross: Seq[String] = Nil
    var comparedCount = 0
    var checkErrored = false
    if (only.isEmpty) {
      try {
        val f = new java.io.File("bench_history.jsonl")
        if (f.exists && dataField.nonEmpty) {
          val myData = dataField.stripSuffix(",")
          val src = scala.io.Source.fromFile(f, "UTF-8")
          val matching = try src.getLines()
            .filter(l => l.contains("\"cpus\":" + cpus + ",") &&
              l.contains("\"sf\":\"" + sfDir + "\"") && l.contains(myData))
            .foldLeft(Option.empty[String])((_, l) => Some(l))
          finally src.close()
          matching.foreach { row =>
            val ts = "\"ts_ms\":(\\d+)".r.findFirstMatchIn(row)
              .map(_.group(1).toLong).getOrElse(-1L)
            // 3-element arrays only match the queries section ([min,
            // med, max]); shuffle rows are 2-element, plans are strings
            def histMed(n: String): Option[Double] =
              ("\"" + java.util.regex.Pattern.quote(n) +
                "\":\\[([-0-9.eE]+),([-0-9.eE]+),([-0-9.eE]+)\\]").r
                .findFirstMatchIn(row).map(_.group(2).toDouble)
            def histPlan(n: String): Option[String] =
              ("\"" + java.util.regex.Pattern.quote(n) + "\":\"([0-9a-f]{12})\"").r
                .findFirstMatchIn(row).map(_.group(1))
            val mm = medians.toMap
            val comparable = names.flatMap { n =>
              for {
                h <- histMed(n); p <- histPlan(n)
                if p == planHashes(n) && mm(n) > 0 && h > 0
              } yield (n, h)
            }
            comparedCount = comparable.size
            def inflatedOf(m: Map[String, Double], factor: Double): Seq[String] =
              comparable.collect { case (n, h) if m(n) > factor * h => n }
            // gross = ratio-gross OR seconds-gross: the ratio path
            // catches cheap queries that multiplied; the absolute term
            // catches expensive ones hiding big phantoms under small
            // ratios (r15's report_dup_coverage shipped +10 s at 2.6×,
            // under the 3× gate — more phantom than everything flagged
            // combined)
            def grossOf(m: Map[String, Double]): Seq[String] =
              comparable.collect { case (n, h)
                if m(n) > grossFactor * h ||
                  m(n) - h > math.max(absFloorSecs, 0.5 * h) => n }
            val firstInflated = inflatedOf(mm, 1.5)
            val broad = comparable.size >= 20 &&
              firstInflated.size * 4 > comparable.size
            // per-query guard: gross outliers re-measure even when the
            // whole-record fraction stays quiet (no minimum comparable
            // count — ONE 6.8× outlier is worth an extra round)
            val gross = grossOf(mm)
            val rerunSet = (if (broad) firstInflated else Nil) ++ gross
            if (rerunSet.nonEmpty) {
              extraSamples = rerunSet.distinct
                .map(n => n -> Seq.fill(runs)(runOnce(n))).toMap
              val sampleMap = samples.toMap
              val mm2 = mm ++ extraSamples.keys.map(n =>
                n -> median(sampleMap(n) ++ extraSamples(n)))
              if (broad) {
                val still = inflatedOf(mm2, 1.5)
                if (still.size * 4 > comparable.size)
                  suspectInfo = Some((ts, still.sorted))
              }
              // queries STILL gross (ratio OR seconds) after the
              // extra round are individually marked in the record
              persistGross = grossOf(mm2).sorted
            }
          }
        }
      } catch { case scala.util.control.NonFatal(_) =>
        // a failed check must not commit an unmarked record (r14
        // ADVICE #5): say the check did not run
        checkErrored = true
      }
    }
    val finalSamples = samples.map { case (n, xs) =>
      (n, xs ++ extraSamples.getOrElse(n, Nil)) }
    val finalMedians = finalSamples.map { case (n, xs) => n -> median(xs) }
    val finalSpreads = finalSamples.map { case (n, xs) => n -> spread(xs) }
    // `compared` makes the check auditable: suspect:false with
    // compared:0 means "no comparable baseline", not "verified clean";
    // `inflated` lists the PER-QUERY persistently-gross names even when
    // the whole-record `suspect` stays false (r14 VERDICT #1), and
    // `check_errored` marks a record whose integrity check failed to
    // run at all (vs ran and found nothing)
    val inflatedJson = persistGross.map("\"" + _ + "\"").mkString("[", ",", "]")
    val errField = if (checkErrored) "\"check_errored\":true," else ""
    val suspectField = suspectInfo match {
      case Some((ts, infl)) =>
        "\"suspect\":true,\"suspect_vs_ts\":" + ts + ",\"suspect_broad\":" +
          infl.map("\"" + _ + "\"").mkString("[", ",", "]") +
          ",\"inflated\":" + inflatedJson +
          ",\"compared\":" + comparedCount + "," + errField
      case None =>
        "\"suspect\":false,\"inflated\":" + inflatedJson +
          ",\"compared\":" + comparedCount + "," + errField
    }

    def numMap(kvs: Seq[(String, Double)]): String =
      kvs.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val qs = numMap(finalMedians)
    val sp = numMap(finalSpreads)
    val ps = names.map(k => "\"" + k + "\":\"" + planHashes(k) + "\"")
      .mkString("{", ",", "}")
    val excluded = SparkEntry.verifyOnly.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val benchForms = SparkEntry.benchForm.keys.toSeq.sorted
      .map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = finalMedians.map(_._2).filter(_ >= 0).sum
    val worstSpread = finalSpreads.map(_._2).max
    // Three SEPARATE lines, timings LAST: the driver keeps the END of
    // stdout and truncation eats from the front — plans and spread are
    // sacrificial, the timings line is the record.
    val plansLine = s"""{"metric":"plans","plans":$ps,"sf":"$sfDir"}"""
    val reranJson = reran.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val spreadLine =
      s"""{"metric":"spread","runs":$runs,"worst":$worstSpread,"reran":$reranJson,"spread":$sp,"sf":"$sfDir"}"""
    val timingsLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"runs":$runs,"cpus":$cpus,"excluded":$excluded,"bench_forms":$benchForms,$suspectField$dataField"sf":"$sfDir"}"""
    val out = plansLine + "\n" + spreadLine + "\n" + timingsLine + "\n"
    // durable copy, immune to stdout truncation entirely
    if (only.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_out.json"),
        out.getBytes("UTF-8"))
      catch { case _: Throwable => () }
    // per-run history row (append): medians + min/max per query, so
    // future rounds diff median-to-median with the noise visible
    val hist = finalSamples.map { case (n, xs) =>
      val s = xs.sorted
      "\"" + n + "\":[" + s.head + "," + median(xs) + "," + s.last + "]"
    }.mkString("{", ",", "}")
    // per-run shuffle bytes [read, written] per query: the volume
    // axis plan hashes can't see
    val shuffleJson = samplesWithShuffle
      .map { case (n, _, rd, wr, _) => "\"" + n + "\":[" + rd + "," + wr + "]" }
      .mkString("{", ",", "}")
    // per-run job launches per query: the scheduling-floor axis —
    // "this query is jobs-bound, not data-bound" becomes checkable
    // from the record alone (r15 VERDICT #6)
    val jobsJson = samplesWithShuffle
      .map { case (n, _, _, _, j) => "\"" + n + "\":" + j }
      .mkString("{", ",", "}")
    // plan hashes ride along so a future diff can tell "median moved,
    // plan unchanged ⇒ host noise" from the history file alone; the
    // per-query spread map rides too (r14 VERDICT #8) so a future
    // judge separates "noisy host" from "noisy query" without a rerun
    val histLine =
      s"""{"ts_ms":${System.currentTimeMillis()},"sf":"$sfDir","cpus":$cpus,"runs":$runs,"total":$total,$suspectField$dataField"queries":$hist,"spread":$sp,"shuffle":$shuffleJson,"jobs":$jobsJson,"plans":$ps}""" + "\n"
    if (only.isEmpty)
      try java.nio.file.Files.write(java.nio.file.Paths.get("bench_history.jsonl"),
        histLine.getBytes("UTF-8"),
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
      catch { case _: Throwable => () }
    println(plansLine)
    println(spreadLine)
    println(timingsLine)
    spark.stop()
  }
}
