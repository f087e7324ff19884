package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

class ProfileAndSamplingSpec extends SparkSpec {
  import spark.implicits._

  // ------------------------------------------------------ histogram

  test("histogram: bucket law, under/overflow, counts conserve rows") {
    val df = Seq(
      ("a", -5.0), // underflow
      ("a", 0.0),  // bucket 0
      ("a", 9.99), // bucket 0
      ("a", 10.0), // bucket 1
      ("a", 99.0), // bucket 9
      ("a", 100.0), // overflow (hi inclusive-exclusive)
      ("b", 55.5)  // bucket 5
    ).toDF("g", "v")
    val h = Profile.histogram(df, Seq("g"), col("v"), lo = 0.0, hi = 100.0, nBuckets = 10)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
    assert(h.map(_._3).sum == 7) // every row lands in exactly one bucket
    val a = h.filter(_._1 == "a").map(x => x._2 -> x._3).toMap
    assert(a == Map(-1 -> 1L, 0 -> 2L, 1 -> 1L, 9 -> 1L, 10 -> 1L))
    // bucket_lo edge = lo + bucket*w
    assert(h.find(x => x._1 == "b" && x._2 == 5).map(_._4).contains(50.0))
  }

  test("histogram: rejects degenerate ranges") {
    val df = Seq(("a", 1.0)).toDF("g", "v")
    intercept[IllegalArgumentException] {
      Profile.histogram(df, Seq("g"), col("v"), lo = 1.0, hi = 1.0, nBuckets = 10)
    }
    intercept[IllegalArgumentException] {
      Profile.histogram(df, Seq("g"), col("v"), lo = 0.0, hi = 1.0, nBuckets = 0)
    }
  }

  // ------------------------------------------------------ winsorize

  test("winsorize: interior values unchanged, outliers clamp to exact quartiles") {
    // group of 1..9: p25 = 3.0, p75 = 7.0 (exact at quartile fractions)
    val df = (1 to 9).map(i => ("g", i.toLong, i.toDouble)).toDF("g", "id", "v")
    val out = Profile.winsorize(df, Seq("g"), "v", 0.25, 0.75)
      .select("id", "v", "v_w").as[(Long, Double, Double)].collect().sortBy(_._1)
    out.foreach { case (_, v, w) =>
      if (v >= 3.0 && v <= 7.0) assert(w == v, s"interior $v moved to $w")
      else if (v < 3.0) assert(w == 3.0)
      else assert(w == 7.0)
    }
    assert(out.length == 9)
    intercept[IllegalArgumentException] {
      Profile.winsorize(df, Seq("g"), "v", 0.75, 0.25)
    }
  }

  // ------------------------------------------------------ mad / moments

  test("mad: exact median and median-absolute-deviation, outlier-robust") {
    // 1..9 plus an extreme outlier: median 5.5, |x−5.5| medians stay tame
    val df = ((1 to 9).map(_.toDouble) :+ 1000.0).map(("g", _)).toDF("g", "v")
    val out = Profile.mad(df, Seq("g"), "v")
      .select("median", "mad").as[(Double, Double)].head()
    // 10 values → median = (5+6)/2 = 5.5; deviations sorted:
    // 0.5,0.5,1.5,1.5,2.5,2.5,3.5,3.5,4.5,994.5 → mad = (2.5+2.5)/2
    assert(out == ((5.5, 2.5)))
  }

  test("moments: variance matches the two-pass definition exactly") {
    val xs = Seq(2.0, 4.0, 4.0, 4.0, 5.0, 5.0, 7.0, 9.0)
    val df = xs.map(("g", _)).toDF("g", "v")
    val out = Profile.moments(df, Seq("g"), col("v"))
      .select("n", "mean", "var_samp", "stddev_samp")
      .as[(Long, Double, Double, Double)].head()
    val m = xs.sum / xs.size
    val v2 = xs.map(x => (x - m) * (x - m)).sum / (xs.size - 1)
    assert(out._1 == 8L && out._2 == m)
    assert(out._3 == math.round(v2 * 1e4) / 1e4)
    assert(out._4 == math.round(math.sqrt(v2) * 1e4) / 1e4)
    // single-row group: defined mean, null variance
    val one = Seq(("h", 3.0)).toDF("g", "v")
    val r1 = Profile.moments(one, Seq("g"), col("v"))
      .select("mean", "var_samp").as[(Double, Option[Double])].head()
    assert(r1 == ((3.0, None)))
  }

  test("moments and pearsonCorr are partitioning-invariant (integer partials)") {
    val df = (1 to 500).map(i => ("g" + (i % 3), i * 0.37, (i % 31).toDouble))
      .toDF("g", "x", "y")
    def run(d: org.apache.spark.sql.DataFrame) =
      (Profile.moments(d, Seq("g"), col("x")).collect().toSet,
        Profile.pearsonCorr(d, Seq("g"), col("x"), col("y")).collect().toSet)
    assert(run(df) == run(df.repartition(13)))
  }

  test("power sums survive magnitudes whose Long squares overflow (r4 ADVICE #1)") {
    // 4e8 units → 4e10 cents → x² ≈ 1.6e21 ≫ Long.MaxValue (9.2e18):
    // squaring in LongType wrapped silently; decimal-first is exact
    val big = 4e8
    val df = Seq(("g", big), ("g", big + 1), ("g", big + 2)).toDF("g", "v")
    val m = Profile.moments(df, Seq("g"), col("v"))
      .select("mean", "var_samp", "stddev_samp")
      .as[(Double, Double, Double)].head()
    assert(m == ((big + 1, 1.0, 1.0)))
    val z = Profile.zscore(df, Seq("g"), "v")
      .select("v", "zscore").as[(Double, Double)].collect().toMap
    assert(z(big) == -1.0 && z(big + 1) == 0.0 && z(big + 2) == 1.0)
    // y = 2x − 1e8 on the same magnitudes: slope/intercept exact
    val xy = Seq(1e8, 2e8, 3e8).map(x => ("g", x, 2 * x - 1e8)).toDF("g", "x", "y")
    val fit = Profile.linearFit(xy, Seq("g"), col("x"), col("y"))
      .select("slope", "intercept").as[(Double, Double)].head()
    assert(fit == ((2.0, -1e8)))
    val corr = Profile.pearsonCorr(xy, Seq("g"), col("x"), col("y"))
      .select("corr").as[Double].head()
    assert(corr == 1.0)
  }

  test("expectations: one-scan rule validation, null predicate = violation") {
    val df = Seq(
      (Some(5.0), "a"), (Some(-1.0), "a"), (None, "b"), (Some(3.0), null)
    ).toDF("v", "t")
    val out = Profile.expectations(df, Seq(
      "v_non_negative" -> (col("v") >= 0),     // -1 fails, null-v fails
      "t_present" -> col("t").isNotNull))      // one null t
      .select("rule", "n_violations", "n_rows", "violation_pct")
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("v_non_negative") == (("v_non_negative", 2L, 4L, 0.5)))
    assert(out("t_present") == (("t_present", 1L, 4L, 0.25)))
  }

  test("expectations decompose: per-batch reports merge to the whole-corpus report") {
    val df = (1 to 100).map(i => (i.toLong, if (i % 7 == 0) -1.0 else i.toDouble))
      .toDF("id", "v")
    val rules = Seq("v_non_negative" -> (col("v") >= 0))
    val whole = Profile.expectations(df, rules)
      .select("rule", "n_violations", "n_rows", "violation_pct")
      .collect().toSet
    // split on an arbitrary predicate — batches of a stream / lake scan
    val merged = Profile.mergeExpectationReports(Seq(
        Profile.expectations(df.filter(col("id") <= 40), rules),
        Profile.expectations(df.filter(col("id") > 40), rules)))
      .select("rule", "n_violations", "n_rows", "violation_pct")
      .collect().toSet
    assert(merged == whole)
  }

  test("columnProfile: null and exact distinct counts per column, one pass") {
    val df = Seq(
      (Some(1L), "x"), (Some(1L), "y"), (None, "y"), (Some(2L), null)
    ).toDF("id", "s")
    val out = Profile.columnProfile(df, Seq("id", "s"))
      .select("column", "n_nulls", "n_distinct", "n_rows")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(out("id") == (("id", 1L, 2L, 4L)))  // distinct skips null
    assert(out("s") == (("s", 1L, 2L, 4L)))
  }

  test("columnProfileApprox: HLL distincts within the rsd bound of exact") {
    val df = (1L to 5000L).map(i => (i, i % 137)).toDF("id", "m")
    val exact = Profile.columnProfile(df, Seq("id", "m"))
      .select("column", "n_distinct").as[(String, Long)].collect().toMap
    val approx = Profile.columnProfileApprox(df, Seq("id", "m"), rsd = 0.05)
      .select("column", "n_distinct_approx").as[(String, Long)].collect().toMap
    for (c <- Seq("id", "m")) {
      val err = math.abs(approx(c) - exact(c)).toDouble / exact(c)
      assert(err <= 0.15, s"$c: approx ${approx(c)} vs exact ${exact(c)} — 3σ bound")
    }
  }

  test("robust-z flags: MAD catches the spike a z-score would dilute") {
    // values 1..4 + a 100 spike: median 3, |dev| = [2,1,0,1,97],
    // MAD = 1 → only the spike exceeds 3·MAD; a constant group's
    // MAD = 0 flags any nonzero deviation (degenerate posture)
    val ev = (Seq((1L, "a", 1.0), (2L, "a", 2.0), (3L, "a", 3.0),
      (4L, "a", 4.0), (5L, "a", 100.0)) ++
      Seq((6L, "c", 5.0), (7L, "c", 5.0), (8L, "c", 5.0), (9L, "c", 7.0)))
      .toDF("event_id", "event_type", "value")
    import org.apache.spark.sql.functions._
    val df = ev.withColumn("__micro", round(col("value") * 1e6).cast("long"))
    val med = df.groupBy("event_type")
      .agg(percentile(col("__micro"), lit(0.5)).as("__med"))
    val dev = df.join(med, "event_type")
      .withColumn("__dev2", abs(lit(2) * col("__micro") - lit(2) * col("__med")))
    val mad = dev.groupBy("event_type")
      .agg(percentile(col("__dev2"), lit(0.5)).as("__mad2"))
    val r = dev.join(mad, "event_type")
      .select(col("event_id"), (col("__dev2") / 2 / 1e6).as("deviation"),
        (col("__mad2") / 2 / 1e6).as("mad"),
        (col("__dev2") > lit(3) * col("__mad2")).as("o"))
      .collect().map(x => x.getLong(0) ->
        (x.getDouble(1), x.getDouble(2), x.getBoolean(3))).toMap
    assert(r(5L) == ((97.0, 1.0, true)), s"spike: ${r(5L)}")
    (1L to 4L).foreach(i => assert(!r(i)._3, s"inlier $i flagged: ${r(i)}"))
    // constant-majority group: MAD 0, the 7.0 deviates → flagged
    assert(r(9L)._2 == 0.0 && r(9L)._3, s"degenerate MAD: ${r(9L)}")
    assert(!r(6L)._3 && !r(7L)._3 && !r(8L)._3)
  }

  test("zscore: standardized values, null for constant/single-row groups") {
    val df = Seq(("g", 1L, 2.0), ("g", 2L, 4.0), ("g", 3L, 6.0),
      ("c", 4L, 5.0), ("c", 5L, 5.0), ("one", 6L, 9.0))
      .toDF("g", "id", "v")
    val out = Profile.zscore(df, Seq("g"), "v")
      .select("id", "zscore").as[(Long, Option[Double])].collect().toMap
    // mean 4, std 2 → z = -1, 0, 1
    assert(out(1L).contains(-1.0) && out(2L).contains(0.0) && out(3L).contains(1.0))
    assert(out(4L).isEmpty && out(5L).isEmpty) // zero variance
    assert(out(6L).isEmpty)                    // n = 1
  }

  test("linearFit: recovers slope/intercept of exact linear data") {
    val df = (1 to 20).map(i => ("g", i.toDouble, 2.0 * i + 3)).toDF("g", "x", "y")
    val out = Profile.linearFit(df, Seq("g"), col("x"), col("y"))
      .select("slope", "intercept").as[(Option[Double], Option[Double])].head()
    assert(out == ((Some(2.0), Some(3.0))))
    // constant x: no fit
    val const = (1 to 20).map(i => ("g", 5.0, i.toDouble)).toDF("g", "x", "y")
    val rc = Profile.linearFit(const, Seq("g"), col("x"), col("y"))
      .select("slope").as[Option[Double]].head()
    assert(rc.isEmpty)
  }

  test("pearsonCorr: ±1 on perfectly linear data, null on constant side") {
    val df = (1 to 20).map(i => ("g", i.toDouble, 2.0 * i + 1)).toDF("g", "x", "y")
    val r = Profile.pearsonCorr(df, Seq("g"), col("x"), col("y"))
      .select("corr").as[Option[Double]].head()
    assert(r.contains(1.0))
    val const = (1 to 20).map(i => ("g", i.toDouble, 7.0)).toDF("g", "x", "y")
    val rc = Profile.pearsonCorr(const, Seq("g"), col("x"), col("y"))
      .select("corr").as[Option[Double]].head()
    assert(rc.isEmpty)
  }

  // ------------------------------------------------------- sampling

  test("minmaxScale: range-normalizes per group, null for constant groups") {
    val df = Seq(("g", 1L, 2.0), ("g", 2L, 4.0), ("g", 3L, 10.0),
      ("c", 4L, 5.0), ("c", 5L, 5.0)).toDF("g", "id", "v")
    val out = Profile.minmaxScale(df, Seq("g"), "v")
      .select("id", "minmax").as[(Long, Option[Double])].collect().toMap
    assert(out(1L).contains(0.0) && out(3L).contains(1.0))
    assert(out(2L).contains(0.25)) // (4−2)/(10−2)
    assert(out(4L).isEmpty && out(5L).isEmpty) // zero range
  }

  test("filterFunnel: ordered cumulative gates, one scan, exact counts") {
    val df = (1 to 100).map(i => (i.toLong, i % 10, i % 2)).toDF("id", "m", "p")
    val out = Profile.filterFunnel(df, Seq(
        "m_small" -> (col("m") < 5),   // 50 pass
        "even" -> (col("p") === 0)))   // of those, m ∈ {0,2,4} even ids
      .select("stage_idx", "stage", "n_in", "n_pass", "n_dropped", "pass_pct")
      .as[(Int, String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1) == ((1, "m_small", 100L, 50L, 50L, 0.5)))
    // m<5 ∧ even: i%10∈{0..4} ∧ i%2=0 → i%10∈{0,2,4} → 30 rows
    assert(out(2) == ((2, "even", 50L, 30L, 20L, 0.6)))
    // stages evaluate in ONE aggregate: a single row in the pre-explode plan
    val plan = Profile.filterFunnel(df, Seq("a" -> (col("m") < 5)))
      .queryExecution.optimizedPlan.toString
    assert(plan.linesIterator.count(_.contains("Aggregate")) == 1)
  }

  test("filterFunnel decomposes: per-batch reports merge to the whole-corpus funnel") {
    val df = (1 to 200).map(i => (i.toLong, i % 10, i % 2)).toDF("id", "m", "p")
    val stages = Seq("m_small" -> (col("m") < 5), "even" -> (col("p") === 0))
    val whole = Profile.filterFunnel(df, stages)
      .select("stage_idx", "stage", "n_in", "n_pass", "n_dropped", "pass_pct")
      .collect().toSet
    val merged = Profile.mergeFunnelReports(Seq(
        Profile.filterFunnel(df.filter(col("id") <= 77), stages),
        Profile.filterFunnel(df.filter(col("id") > 77), stages)))
      .select("stage_idx", "stage", "n_in", "n_pass", "n_dropped", "pass_pct")
      .collect().toSet
    assert(merged == whole)
  }

  test("driftChiSquare: zero for proportional groups, positive under drift") {
    // group A: 60 low + 30 high; B: 20 low + 10 high — same 2:1 mix → χ² = 0
    val same = (Seq.fill(60)(("A", 1.0)) ++ Seq.fill(30)(("A", 7.0)) ++
      Seq.fill(20)(("B", 1.0)) ++ Seq.fill(10)(("B", 7.0))).toDF("g", "v")
    val s = Profile.driftChiSquare(same, "g", col("v"), 0.0, 10.0, 2)
      .select("g", "n", "chi_square").as[(String, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(s("A") == (("A", 90L, 0.0)) && s("B") == (("B", 30L, 0.0)))
    // flip B's mix → both groups drift from the pooled distribution
    val skew = (Seq.fill(60)(("A", 1.0)) ++ Seq.fill(30)(("A", 7.0)) ++
      Seq.fill(10)(("B", 1.0)) ++ Seq.fill(20)(("B", 7.0))).toDF("g", "v")
    val k = Profile.driftChiSquare(skew, "g", col("v"), 0.0, 10.0, 2)
      .select("g", "chi_square").as[(String, Double)].collect().toMap
    assert(k("A") > 0 && k("B") > 0 && k("B") > k("A"))
  }

  test("hashSample: deterministic, append-invariant membership") {
    val base = (1L to 400L).toDF("id")
    val s1 = Sampling.hashSample(base, "id", 25, "s").as[Long].collect().toSet
    val s2 = Sampling.hashSample(base.repartition(7), "id", 25, "s")
      .as[Long].collect().toSet
    assert(s1 == s2, "membership must not depend on partitioning")
    // appending new rows never changes membership of existing keys
    val appended = (1L to 600L).toDF("id")
    val s3 = Sampling.hashSample(appended, "id", 25, "s").as[Long].collect().toSet
    assert(s3.filter(_ <= 400L) == s1)
    // rate is roughly honored (md5 is uniform; 25% of 400 ± wide margin)
    assert(s1.size > 50 && s1.size < 150)
    // monotone in pct: a 10% sample is a subset of the 25% sample
    val s10 = Sampling.hashSample(base, "id", 10, "s").as[Long].collect().toSet
    assert(s10.subsetOf(s1))
  }

  test("stratified: per-stratum rates, 0 drops and 100 keeps") {
    val df = (1L to 300L).map(i => (i, if (i % 3 == 0) "en" else if (i % 3 == 1) "fr" else "de"))
      .toDF("id", "lang")
    val out = Sampling.stratified(df, "id", "lang",
        rates = Seq("en" -> 0, "fr" -> 100), defaultPct = 50, salt = "s")
      .as[(Long, String)].collect()
    assert(!out.exists(_._2 == "en"), "rate 0 must drop the stratum")
    assert(out.count(_._2 == "fr") == 100, "rate 100 must keep every row")
    val de = out.filter(_._2 == "de").map(_._1).toSet
    // the de stratum at 50% is exactly hashSample(50) restricted to de
    val expected = Sampling.hashSample(df.filter($"lang" === "de"), "id", 50, "s")
      .select("id").as[Long].collect().toSet
    assert(de == expected)
  }

  test("mixtureResample: bottleneck keeps all, rates track target weights") {
    // a: 4000 rows, b: 1000, c: 3000, d unlisted. Weights a:1, b:2, c:1
    // → deficit ratios n/w: a 4000, b 500, c 3000 → bottleneck b keeps
    // 100%; targets ∝ (1,2,1)·500 → a keeps 500/4000=12.5%, c 16.67%
    val df = ((1 to 4000).map(i => (s"a$i", "a")) ++
      (1 to 1000).map(i => (s"b$i", "b")) ++
      (1 to 3000).map(i => (s"c$i", "c")) ++
      (1 to 500).map(i => (s"d$i", "d"))).toDF("id", "g")
    val out = Sampling.mixtureResample(df, "id", "g",
      Seq("a" -> 1, "b" -> 2, "c" -> 1))
    val counts = out.groupBy("g").count().as[(String, Long)].collect().toMap
    assert(!counts.contains("d"), "unlisted strata must drop")
    assert(counts("b") == 1000L, "bottleneck stratum must keep everything")
    // hash-binomial realization: expect ~500 ± a generous band
    assert(math.abs(counts("a") - 500L) <= 100, s"a kept ${counts("a")}")
    assert(math.abs(counts("c") - 500L) <= 100, s"c kept ${counts("c")}")
    // deterministic under re-read and repartition
    val again = Sampling.mixtureResample(df.repartition(7), "id", "g",
      Seq("a" -> 1, "b" -> 2, "c" -> 1)).select("id").as[String].collect().toSet
    assert(again == out.select("id").as[String].collect().toSet)
  }

  test("temperatureResample: exact sqrt apportionment, repeats, flattening") {
    // sizes 4 and 9 have integer sqrts → w = 2·2²⁰ and 3·2²⁰, so the
    // whole apportionment is hand-computable with zero float edges:
    // totalOut=10 → quota_a = 4 (1 copy each), quota_b = 6 (six docs
    // 1 copy, three docs 0)
    val df = ((1 to 4).map(i => (i.toLong, "a")) ++
      (11 to 19).map(i => (i.toLong, "b"))).toDF("id", "g")
    val out = Sampling.temperatureResample(df, "id", "g", totalOut = 10L)
      .collect().map(r => (r.getAs[Long]("id"), r.getAs[String]("g"),
        r.getAs[Long]("n_copies")))
    assert(out.length == 13, "full report: every doc gets a copy count")
    assert(out.map(_._3).sum == 10L, "sum of copies IS the budget")
    assert(out.filter(_._2 == "a").forall(_._3 == 1L))
    assert(out.filter(_._2 == "b").map(_._3).sorted.toSeq ==
      Seq(0L, 0L, 0L, 1L, 1L, 1L, 1L, 1L, 1L))
    // upsampling regime: totalOut=100 → a: 10 copies each; b: quota 60
    // over 9 docs = base 6, six docs bumped to 7
    val up = Sampling.temperatureResample(df, "id", "g", totalOut = 100L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("n_copies")))
    assert(up.map(_._2).sum == 100L)
    assert(up.filter(_._1 == "a").forall(_._2 == 10L))
    assert(up.filter(_._1 == "b").map(_._2).sorted.toSeq ==
      Seq(6L, 6L, 6L, 7L, 7L, 7L, 7L, 7L, 7L))
    // α-flattening: 100-vs-1 docs at α=½ → weights 10:1, so with
    // totalOut=110 the rare doc trains 10 epochs (natural share would
    // give it ~1) while each head doc trains once
    val skew = ((1 to 100).map(i => (i.toLong, "big")) :+ (999L, "rare"))
      .toDF("id", "g")
    val flat = Sampling.temperatureResample(skew, "id", "g", totalOut = 110L)
      .collect().map(r => (r.getAs[String]("g"), r.getAs[Long]("n_copies")))
    assert(flat.filter(_._1 == "rare").map(_._2).toSeq == Seq(10L))
    assert(flat.filter(_._1 == "big").forall(_._2 == 1L))
    // deterministic under repartition; Σ invariant at α=¼ and ¾ too
    val again = Sampling.temperatureResample(df.repartition(7), "id", "g",
      totalOut = 10L).collect()
      .map(r => (r.getAs[Long]("id"), r.getAs[Long]("n_copies"))).toSet
    assert(again == out.map(t => (t._1, t._3)).toSet)
    Seq(1, 3).foreach { aq =>
      val o = Sampling.temperatureResample(df, "id", "g", totalOut = 37L,
        alphaQuarters = aq)
      assert(o.agg(sum("n_copies")).head.getLong(0) == 37L, s"alpha=$aq/4")
    }
    // null strata drop from the report; their docs get no copies
    val withNull = df.union(Seq((99L, null.asInstanceOf[String])).toDF("id", "g"))
    val n = Sampling.temperatureResample(withNull, "id", "g", totalOut = 10L)
    assert(n.count() == 13 && n.agg(sum("n_copies")).head.getLong(0) == 10L)
  }

  test("capPerGroup: at most k per group, stable under repartition") {
    val df = (1L to 200L).map(i => (i, "g" + (i % 3))).toDF("id", "g")
    val out = Sampling.capPerGroup(df, Seq("g"), "id", k = 5, salt = "s")
      .select("g", "id").as[(String, Long)].collect()
    assert(out.groupBy(_._1).forall(_._2.length == 5))
    val again = Sampling.capPerGroup(df.repartition(11), Seq("g"), "id", k = 5, salt = "s")
      .select("g", "id").as[(String, Long)].collect()
    assert(out.toSet == again.toSet, "cap must pick the same rows on any layout")
    // groups smaller than k pass through whole
    val tiny = Seq((1L, "x"), (2L, "x")).toDF("id", "g")
    assert(Sampling.capPerGroup(tiny, Seq("g"), "id", k = 5).count() == 2)
  }

  test("tokenBudgetSample: budgets filled in md5 order, ≤1 doc overshoot") {
    val df = (1L to 60L).map(i => (i, "s" + (i % 2), 10L + i % 3))
      .toDF("doc_id", "src", "n")
    val out = Sampling.tokenBudgetSample(df, "doc_id", "src", col("n"),
        budgets = Seq("s0" -> 55L), defaultBudget = 83L, salt = "b")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[String]("src"),
        r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_before"),
        r.getAs[Boolean]("kept")))
    assert(out.length == 60, "full audit report: every doc gets a verdict")
    // per source: kept ⟺ cum_before < budget, and the kept set fills
    // the budget with at most one doc of overshoot
    Seq("s0" -> 55L, "s1" -> 83L).foreach { case (src, b) =>
      val rows = out.filter(_._2 == src)
      rows.foreach { case (id, _, _, cum, kept) =>
        assert(kept == (cum < b), s"doc $id kept flag")
      }
      val keptTokens = rows.filter(_._5).map(_._3).sum
      val maxDoc = rows.map(_._3).max
      assert(keptTokens >= b, s"$src under-filled: $keptTokens < $b")
      assert(keptTokens < b + maxDoc, s"$src overshot by a full doc+")
      // cum_before is consistent: per doc, the sum of earlier kept+
      // dropped... all docs ordered by md5 — recompute independently
      val md5 = (id: Long) => {
        val d = java.security.MessageDigest.getInstance("MD5")
          .digest((id.toString + "b").getBytes("UTF-8"))
        d.map("%02x".format(_)).mkString
      }
      val ordered = rows.sortBy { case (id, _, _, _, _) => (md5(id), id) }
      var cum = 0L
      ordered.foreach { case (id, _, n, cb, _) =>
        assert(cb == cum, s"doc $id cum_before $cb expected $cum")
        cum += n
      }
    }
    // deterministic under repartition
    val again = Sampling.tokenBudgetSample(df.repartition(7), "doc_id",
        "src", col("n"), Seq("s0" -> 55L), 83L, salt = "b")
      .collect().map(r => (r.getAs[Long]("doc_id"), r.getAs[Boolean]("kept")))
    assert(again.toSet == out.map(r => (r._1, r._5)).toSet)
  }

  test("corpusReport: per-source volume, lang spread, dup mass, keep rate") {
    // 60 stopwords → passes every Gopher gate (mwl 3.6, all alpha)
    val keeper = Seq.fill(12)("the and that have with").mkString(" ")
    val docs = Seq(
      (1L, "w1 w2 w3", "en", "a"),
      (2L, "w1 w2 w3", "es", "a"), // exact dup of 1, different lang
      (3L, "w4 w5 w6", "en", "a"),
      (4L, keeper, "en", "b")
    ).toDF("doc_id", "text", "lang", "source")
    val out = Profile.corpusReport(docs).collect()
      .map(r => r.getAs[String]("source") -> r).toMap
    val a = out("a")
    assert(a.getAs[Long]("n_docs") == 3L && a.getAs[Long]("n_tokens") == 9L)
    assert(a.getAs[Double]("mean_doc_tokens") == 3.0)
    assert(a.getAs[Long]("n_langs") == 2L)
    assert(a.getAs[Long]("n_exact_dup") == 1L)
    assert(a.getAs[Double]("dup_ratio") == 0.3333)
    assert(a.getAs[Long]("n_keep") == 0L && a.getAs[Double]("keep_ratio") == 0.0)
    val b = out("b")
    assert(b.getAs[Long]("n_docs") == 1L && b.getAs[Long]("n_tokens") == 60L)
    assert(b.getAs[Long]("n_exact_dup") == 0L)
    assert(b.getAs[Long]("n_keep") == 1L && b.getAs[Double]("keep_ratio") == 1.0)
  }

  test("weightedSystematic: exactly n draws per stratum, weight-proportional, exact integers") {
    val docs = (1 to 40).map(i =>
      (i.toLong, if (i <= 20) "x" else "y",
        if (i == 1) 0L else if (i == 2) 500L else 10L))
      .toDF("id", "lang", "w")
    val out = Sampling.weightedSystematic(docs, "id", "lang", col("w"),
        n = 5, salt = "t")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(4))).toSeq
    val perLang = out.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    assert(perLang == Map("x" -> 5L, "y" -> 5L),
      s"each stratum must draw exactly n: $perLang")
    val copies = out.map(r => r._1 -> r._3).toMap
    assert(copies(1L) == 0L, "zero-weight row must never draw")
    // row 2 holds 500 of x's 680 total weight -> ~73% of 5 draws
    assert(copies(2L) >= 3L, s"heavy row must saturate: ${copies(2L)}")
  }

  test("weightedSystematic is partitioning-independent") {
    val docs = (1 to 100).map(i => (i.toLong, "s", (i % 7 + 1).toLong))
      .toDF("id", "lang", "w")
    def run(df: org.apache.spark.sql.DataFrame) =
      Sampling.weightedSystematic(df, "id", "lang", col("w"), n = 10)
        .collect().map(r => (r.getLong(0), r.getLong(4))).toSet
    assert(run(docs.repartition(1)) == run(docs.repartition(17)))
  }

  test("weightedSystematic: cum·n products beyond 2^63 stay exact (r14 ADVICE #4)") {
    // two rows of ~4.6e18 each: total ≈ 9.2e18 fits a Long, but
    // (cum + w)·n ≈ 2.8e19 overflows 2^63 ≈ 9.2e18 — the old Long form
    // wrapped negative and corrupted the threshold crossings
    val big = 4_600_000_000_000_000_000L
    val docs = Seq((1L, "s", big), (2L, "s", big)).toDF("id", "lang", "w")
    val out = Sampling.weightedSystematic(docs, "id", "lang", col("w"), n = 3)
      .collect().map(r => r.getLong(0) -> r.getLong(4)).toMap
    assert(out.values.forall(_ >= 0L), s"negative copies = overflow: $out")
    assert(out.values.sum == 3L, s"Σ n_copies must stay exactly n: $out")
    // equal weights, n=3: thresholds at W/3, 2W/3, W -> one row draws 1,
    // the other 2 (which one depends only on the md5 order)
    assert(out.values.toSeq.sorted == Seq(1L, 2L), s"split must be 1/2: $out")
  }
}
