package graft.ext


import org.apache.spark.sql.functions._
import graft.SparkSpec
import graft.functions.VectorMath

class SimilarityAndSeriesSpec extends SparkSpec {
  import spark.implicits._

  // -------------------------------------------------------- VectorMath

  test("dotF: sequential-order float dot product, null-safe") {
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(4.0f, 5.0f, 6.0f)),
      (null, Array(1.0f))
    ).toDF("a", "b")
    val out = df.select(VectorMath.dotF(col("a"), col("b"))).collect()
    assert(out(0).getDouble(0) == 32.0)
    assert(out(1).isNullAt(0))
  }

  test("cosineF: 1 for parallel, 0 for orthogonal vectors") {
    val df = Seq(
      (Array(2.0f, 0.0f), Array(5.0f, 0.0f)),
      (Array(1.0f, 0.0f), Array(0.0f, 3.0f))
    ).toDF("a", "b")
    val out = df.select(round(VectorMath.cosineF(col("a"), col("b")), 6))
      .as[Double].collect()
    assert(out.toSeq == Seq(1.0, 0.0))
  }

  // -------------------------------------------------------- VectorQuant

  test("int8 quantization: bounded error, exact extremes, zero-vector safe") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f, 0.0f)),
      (2L, Array(0.003f, 0.001f, -0.002f, 0.004f)), // tiny magnitudes
      (3L, Array(0.0f, 0.0f, 0.0f, 0.0f))           // zero vector
    ).toDF("vec_id", "embedding")
    val out = VectorQuant.withQuantized(vecs, "embedding")
      .select(col("vec_id"), col("scale"), col("q"),
        VectorQuant.dequantize(col("q"), col("scale")).as("dq"))
      .as[(Long, Double, Seq[Byte], Seq[Double])].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    // the max-|x| component always quantizes to ±127 exactly
    assert(out(1L)._2.toSeq == Seq[Byte](64, -127, 32, 0))
    // dequantization error ≤ half a quantization step per component
    for ((id, orig) <- Seq(1L -> Seq(0.5, -1.0, 0.25, 0.0),
        2L -> Seq(0.003, 0.001, -0.002, 0.004))) {
      val (scale, _, dq) = out(id)
      orig.zip(dq).foreach { case (x, d) =>
        assert(math.abs(x - d) <= 0.5 / scale + 1e-9,
          s"vec $id component $x dequantized to $d (scale $scale)")
      }
    }
    // zero vector: scale 0, all-zero bytes, dequantizes to zeros
    assert(out(3L)._1 == 0.0 && out(3L)._2.forall(_ == 0) && out(3L)._3.forall(_ == 0.0))
  }

  // -------------------------------------------------------- Similarity

  private val corpus = Seq(
    (1L, "A", Array(1.0f, 0.0f)),
    (2L, "A", Array(0.9f, 0.1f)),
    (3L, "B", Array(0.0f, 1.0f)),
    (4L, "B", Array(0.1f, 0.9f))
  ).toDF("vec_id", "label", "embedding")

  test("topK: correct neighbor ordering, self excluded, rank bounded by k") {
    val q = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.topK(corpus, q, "vec_id", "embedding", k = 2)
      .orderBy("rank").as[(Long, Long, Double, Int)].collect()
    assert(out.length == 2)
    assert(out(0)._2 == 2L) // nearest is the 0.9/0.1 vector
    assert(out.forall(_._2 != 1L)) // self excluded
    assert(out(0)._3 > out(1)._3)
  }

  test("topKBlocked: scoring restricted to the query's block") {
    val q = corpus.filter(col("vec_id") === 1L)
    val out = Similarity.topKBlocked(corpus, q, "vec_id", "embedding", "label", k = 10)
      .as[(Long, Long, Double, Int)].collect()
    assert(out.map(_._2).toSet == Set(2L)) // only block-A rows scored (minus self)
  }

  test("seasonalAnomaly: cross-year climatology in micro space, exact anomalies") {
    val monthly = Seq(
      ("A", 2020, 1, 1000000L), ("A", 2021, 1, 3000000L), // Jan mean 2.0
      ("A", 2020, 2, 5000000L),                           // lone Feb
      ("B", 2020, 1, 4000000L)
    ).toDF("status", "y", "m", "__micro")
    val out = SeriesOps.seasonalAnomaly(monthly, Seq("status"), "m", "__micro")
      .select("status", "y", "m", "n_years", "climatology", "value", "anomaly")
      .as[(String, Int, Int, Long, Double, Double, Double)].collect()
      .map(r => (r._1, r._2, r._3) -> r).toMap
    assert(out(("A", 2020, 1)) == (("A", 2020, 1, 2L, 2.0, 1.0, -1.0)))
    assert(out(("A", 2021, 1)) == (("A", 2021, 1, 2L, 2.0, 3.0, 1.0)))
    assert(out(("A", 2020, 2)) == (("A", 2020, 2, 1L, 5.0, 5.0, 0.0)))
    assert(out(("B", 2020, 1)) == (("B", 2020, 1, 1L, 4.0, 4.0, 0.0)))
  }

  test("knnGraph: directed per-vector top-k within blocks, singleton blocks emit nothing") {
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f), "X"),
      (2L, Array(0.9f, 0.1f), "X"),
      (3L, Array(0.0f, 1.0f), "X"),
      (4L, Array(1.0f, 1.0f), "Y") // alone in its block
    ).toDF("vec_id", "embedding", "label")
    val out = Similarity.knnGraph(vecs, "vec_id", "embedding", "label", k = 2)
      .as[(Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._4) -> (r._2, r._3)).toMap
    // cos(1,2)=0.9/√0.82→0.9939, cos(1,3)=0, cos(2,3)=0.1/√0.82→0.1104
    assert(out((1L, 1)) == ((2L, 0.9939)) && out((1L, 2)) == ((3L, 0.0)))
    assert(out((2L, 1)) == ((1L, 0.9939)) && out((2L, 2)) == ((3L, 0.1104)))
    assert(out((3L, 1)) == ((2L, 0.1104)) && out((3L, 2)) == ((1L, 0.0)))
    assert(!out.keySet.exists(_._1 == 4L), "singleton block has no neighbors")
    // hot-block guard: THROWS before the quadratic self-join
    val e = intercept[IllegalStateException] {
      Similarity.knnGraph(vecs, "vec_id", "embedding", "label", k = 2,
        maxBlock = 2).collect()
    }
    assert(e.getMessage.contains("maxBlock"))
    // at the bound it still runs (X holds exactly 3)
    assert(Similarity.knnGraph(vecs, "vec_id", "embedding", "label", k = 2,
      maxBlock = 3).count() == 6L)
  }

  test("mineTriplets: positive = rank 1, negative = first margined rank ≥ negFromRank") {
    // block Y: five spread 2-D vectors, so every anchor has ranked
    // neighbors with distinct cosines; block X: FOUR near-identical
    // vectors — rank 3 exists but every candidate negative sits inside
    // the margin, so X anchors must DROP (no false negatives in the
    // triplet set)
    def at(deg: Double) = Array(math.cos(math.toRadians(deg)).toFloat,
      math.sin(math.toRadians(deg)).toFloat)
    val vecs = (Seq(1L -> 0.0, 2L -> 10.0, 3L -> 45.0, 4L -> 90.0, 5L -> 170.0)
      .map { case (id, d) => (id, at(d), "Y") } ++
      Seq(11L -> 0.0, 12L -> 0.5, 13L -> 1.0, 14L -> 1.5)
        .map { case (id, d) => (id, at(d), "X") }).toDF("vec_id", "embedding", "label")
    val out = Similarity.mineTriplets(vecs, "vec_id", "embedding", "label",
        k = 4, negFromRank = 3, margin = 0.05)
      .collect().map(r => r.getAs[Long]("anchor_id") ->
        (r.getAs[Long]("positive_id"), r.getAs[Double]("pos_cosine"),
         r.getAs[Long]("negative_id"), r.getAs[Double]("neg_cosine"))).toMap
    assert(!out.keySet.exists(_ > 10L), "within-margin block yields no triplets")
    // recompute the expectation from the knn graph itself
    val g = Similarity.knnGraph(vecs, "vec_id", "embedding", "label", k = 4)
      .as[(Long, Long, Double, Int)].collect()
    val expected = g.groupBy(_._1).flatMap { case (a, rows) =>
      val pos = rows.find(_._4 == 1).get
      rows.filter(r => r._4 >= 3 && r._3 <= pos._3 - 0.05)
        .sortBy(_._4).headOption
        .map(n => a -> (pos._2, pos._3, n._2, n._3))
    }.toMap
    assert(out == expected.filter(_._1 <= 10L) && out.nonEmpty)
    // every emitted negative honors rank offset AND margin
    out.foreach { case (_, (_, pc, _, nc)) => assert(nc <= pc - 0.05) }
  }

  test("topKQuantizedRerank: full-coverage candidates ≡ exact topK; high recall at factor 4") {
    val e = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val q = e.filter(col("vec_id") < 3)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("query_id", "neighbor_id", "cosine", "rank")
        .as[(Long, Long, Double, Int)].collect().sortBy(r => (r._1, r._4)).toSeq
    // candidateFactor covering the whole corpus ⇒ the rerank sees every
    // vector ⇒ output ≡ brute force, row for row
    val full = rows(Similarity.topKQuantizedRerank(e, q, "vec_id", "embedding",
      k = 5, candidateFactor = 200))
    val brute = rows(Similarity.topK(e, q, "vec_id", "embedding", k = 5))
    assert(full == brute)
    // at the catalog's factor 4, int8 error on dim-8 vectors should
    // barely perturb candidate ranking: recall ≥ 80%
    val approx = rows(Similarity.topKQuantizedRerank(e, q, "vec_id", "embedding",
      k = 5, candidateFactor = 4)).map(r => (r._1, r._2)).toSet
    val hits = brute.map(r => (r._1, r._2)).count(approx)
    assert(hits >= (brute.size * 0.8).toInt, s"recall ${hits}/${brute.size}")
  }

  test("quantized rerank: the sentinel ranks zero-norm vectors out of the candidate set") {
    // cos_q of a zero-quantized vector is the −2.0 sentinel (not NaN),
    // so with k·factor = 2 candidates the zero vector never reaches the
    // exact re-rank — where its cosine WOULD be NaN
    val z = Seq(
      (1L, Array(1.0f, 0.0f)), (2L, Array(0.8f, 0.2f)),
      (3L, Array(0.0f, 0.0f)), (4L, Array(0.5f, 0.5f))
    ).toDF("vec_id", "embedding")
    val out = Similarity.topKQuantizedRerank(z, z.filter(col("vec_id") === 1L),
        "vec_id", "embedding", k = 2, candidateFactor = 1)
      .select("neighbor_id", "cosine").as[(Long, Double)].collect().toMap
    assert(out.keySet == Set(2L, 4L))
    assert(!out.values.exists(_.isNaN))
  }

  test("topK plan broadcasts the query side (no corpus shuffle)") {
    val q = corpus.filter(col("vec_id") === 1L)
    val plan = Similarity.topK(corpus, q, "vec_id", "embedding", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastExchange"),
      s"expected broadcast join in plan:\n$plan")
  }

  // ---------------------------------------------------------- SeriesOps

  private val series = Seq(
    ("X", 1, 10.0), ("X", 2, 12.0), ("X", 3, 9.0), ("Y", 1, 100.0), ("Y", 2, 100.0)
  ).toDF("indicator", "t", "value")

  test("periodChange: per-series lag delta, null at series start") {
    val out = SeriesOps.periodChange(series, Seq("indicator"), Seq("t"))
      .select("indicator", "t", "change")
      .as[(String, Int, Option[Double])].collect().toSet
    assert(out == Set(
      ("X", 1, None), ("X", 2, Some(2.0)), ("X", 3, Some(-3.0)),
      ("Y", 1, None), ("Y", 2, Some(0.0))))
  }

  test("ewma: α=½ dyadic weights, head-normalized (hand-computed)") {
    import spark.implicits._
    val d = Seq(("a", 1, 1.0), ("a", 2, 2.0), ("a", 3, 4.0),
      ("b", 1, 10.0)).toDF("indicator", "t", "value")
    val out = SeriesOps.ewma(d, Seq("indicator"), Seq("t"))
      .select("indicator", "t", "ewma")
      .as[(String, Int, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // adjust=True partial normalization: y1=1, y2=(2+.5)/1.5,
    // y3=(4+1+.25)/1.75 — exact dyadic checkpoints
    assert(out(("a", 1)) == 1.0)
    assert(out(("a", 2)) == 1.6667)
    assert(out(("a", 3)) == 3.0)
    assert(out(("b", 1)) == 10.0, "each series normalizes independently")
  }

  test("movingAvg: trailing window clipped at series start") {
    val out = SeriesOps.movingAvg(series, Seq("indicator"), Seq("t"), n = 2)
      .filter(col("indicator") === "X").orderBy("t")
      .select("moving_avg").as[Double].collect()
    assert(out.toSeq == Seq(10.0, 11.0, 10.5))
  }

  test("yoyChange: 12-period lag within series") {
    val monthly = (1 to 24).map(i => ("X", i, i.toDouble)).toDF("indicator", "t", "value")
    val out = SeriesOps.yoyChange(monthly, Seq("indicator"), Seq("t"))
      .filter(col("t") === 13).select("yoy_change").as[Double].head()
    assert(out == 12.0)
  }

  test("asofJoin: most recent right value at-or-before each left time") {
    val left = Seq(("X", 1), ("X", 2), ("X", 3), ("X", 5), ("Y", 1))
      .toDF("indicator", "t")
    val right = Seq(("X", 2, 20.0), ("X", 4, 40.0)).toDF("indicator", "t", "v")
    val out = SeriesOps.asofJoin(left, right, Seq("indicator"), "t", "v")
      .select("indicator", "t", "asof_value")
      .as[(String, Int, Option[Double])].collect().toSet
    assert(out == Set(
      ("X", 1, None),        // nothing at or before t=1
      ("X", 2, Some(20.0)),  // equal time: right row visible
      ("X", 3, Some(20.0)),
      ("X", 5, Some(40.0)),
      ("Y", 1, None)))       // key isolation
  }

  test("asofJoinTolerance: matches staler than the bound null out") {
    val left = Seq(("X", 2), ("X", 3), ("X", 5)).toDF("indicator", "t")
    val right = Seq(("X", 2, 20.0)).toDF("indicator", "t", "v")
    val out = SeriesOps.asofJoinTolerance(left, right, Seq("indicator"),
        "t", "v", tolerance = 1L)
      .select("t", "asof_value").as[(Int, Option[Double])].collect().toSet
    assert(out == Set(
      (2, Some(20.0)),  // distance 0
      (3, Some(20.0)),  // distance 1 == tolerance
      (5, None)))       // distance 3 > tolerance: stale, nulled
  }

  test("asofJoinForward: earliest right value at-or-after each left time") {
    val left = Seq(("X", 1), ("X", 2), ("X", 3), ("X", 5), ("Y", 1))
      .toDF("indicator", "t")
    val right = Seq(("X", 2, 20.0), ("X", 4, 40.0)).toDF("indicator", "t", "v")
    val out = SeriesOps.asofJoinForward(left, right, Seq("indicator"), "t", "v")
      .select("indicator", "t", "asof_value")
      .as[(String, Int, Option[Double])].collect().toSet
    assert(out == Set(
      ("X", 1, Some(20.0)),
      ("X", 2, Some(20.0)),  // equal time: right row visible
      ("X", 3, Some(40.0)),
      ("X", 5, None),        // nothing at or after t=5
      ("Y", 1, None)))       // key isolation
  }

  test("asofJoinForwardTolerance: next matches further than the bound null out") {
    val left = Seq(("X", 2), ("X", 1), ("X", -2)).toDF("indicator", "t")
    val right = Seq(("X", 2, 20.0)).toDF("indicator", "t", "v")
    val out = SeriesOps.asofJoinForwardTolerance(left, right, Seq("indicator"),
        "t", "v", tolerance = 1L)
      .select("t", "asof_value").as[(Int, Option[Double])].collect().toSet
    assert(out == Set(
      (2, Some(20.0)),   // distance 0
      (1, Some(20.0)),   // distance 1 == tolerance
      (-2, None)))       // distance 4 > tolerance: too far ahead, nulled
  }

  test("asofJoinNearest: closest observation wins; ties go backward") {
    val left = Seq(("X", 1), ("X", 2), ("X", 3), ("X", 6), ("Y", 9)).toDF("indicator", "t")
    val right = Seq(("X", 0, 0.0), ("X", 4, 40.0)).toDF("indicator", "t", "v")
    val out = SeriesOps.asofJoinNearest(left, right, Seq("indicator"), "t", "v")
      .select("indicator", "t", "asof_value")
      .as[(String, Int, Option[Double])].collect().toSet
    assert(out == Set(
      ("X", 1, Some(0.0)),   // 1 back vs 3 ahead
      ("X", 2, Some(0.0)),   // tie (2 vs 2) → earlier
      ("X", 3, Some(40.0)),  // 3 back vs 1 ahead
      ("X", 6, Some(40.0)),  // nothing ahead → backward
      ("Y", 9, None)))       // key isolation
  }

  test("locfFill: nulls carry the last observation; leading gaps stay null") {
    val df = Seq(
      ("X", 1, None), ("X", 2, Some(2.0)), ("X", 3, None), ("X", 4, None),
      ("X", 5, Some(5.0)), ("Y", 1, None)
    ).toDF("k", "t", "v")
    val out = SeriesOps.locfFill(df, Seq("k"), Seq("t"), "v")
      .select("k", "t", "filled").as[(String, Int, Option[Double])].collect().toSet
    assert(out == Set(
      ("X", 1, None), ("X", 2, Some(2.0)), ("X", 3, Some(2.0)),
      ("X", 4, Some(2.0)), ("X", 5, Some(5.0)), ("Y", 1, None)))
  }

  test("interpolateFill: interior gaps take the straight line; edges stay null") {
    val df = Seq(
      ("X", 0, None), ("X", 1, Some(2.0)), ("X", 2, None), ("X", 3, None),
      ("X", 4, Some(5.0)), ("X", 6, None), ("X", 8, Some(13.0)),
      ("X", 9, None), ("Y", 1, None)
    ).toDF("k", "t", "v")
    val out = SeriesOps.interpolateFill(df, Seq("k"), "t", "v")
      .select("k", "t", "filled").as[(String, Int, Option[Double])]
      .collect().toSet
    assert(out == Set(
      ("X", 0, None),                  // leading gap: no left anchor
      ("X", 1, Some(2.0)), ("X", 2, Some(3.0)), ("X", 3, Some(4.0)),
      ("X", 4, Some(5.0)),
      ("X", 6, Some(9.0)),             // non-equidistant: 5 + 8·(2/4)
      ("X", 8, Some(13.0)),
      ("X", 9, None),                  // trailing gap: no right anchor
      ("Y", 1, None)))
  }

  test("topPaths: sliding 3-step paths per entity, deterministic top-k cut") {
    // user 1: a b a b a → (a,b,a) ×2, (b,a,b) ×1; user 2: a b a →
    // (a,b,a) ×1; user 3: two events, no 3-window
    val df = Seq(
      (1L, 10L, "a"), (1L, 11L, "b"), (1L, 12L, "a"), (1L, 13L, "b"),
      (1L, 14L, "a"),
      (2L, 20L, "a"), (2L, 21L, "b"), (2L, 22L, "a"),
      (3L, 30L, "a"), (3L, 31L, "b")
    ).toDF("user_id", "event_id", "event_type")
    val all = SeriesOps.topPaths(df, "user_id", "event_type",
      Seq("event_id"), k = 10)
      .as[(String, String, String, Long)].collect().toSeq
    assert(all == Seq(("a", "b", "a", 3L), ("b", "a", "b", 1L)))
    // the k cut keeps the count-DESC/path-ASC head
    val top1 = SeriesOps.topPaths(df, "user_id", "event_type",
      Seq("event_id"), k = 1)
      .as[(String, String, String, Long)].collect().toSeq
    assert(top1 == Seq(("a", "b", "a", 3L)))
  }

  test("sessionize: gap >= threshold starts a new 0-based session") {
    val df = Seq(
      (1L, 10L, 0L), (1L, 11L, 1000L), (1L, 12L, 5000L), (1L, 13L, 5500L),
      (2L, 20L, 0L)
    ).toDF("user_id", "event_id", "ts_us")
    val out = SeriesOps.sessionize(df, "user_id", "ts_us",
        Seq("ts_us", "event_id"), gapUs = 3000L)
      .select("event_id", "session_seq").as[(Long, Long)].collect().toMap
    assert(out(10L) == 0L && out(11L) == 0L) // gap 1000 < 3000
    assert(out(12L) == 1L && out(13L) == 1L) // gap 4000 >= 3000 breaks
    assert(out(20L) == 0L)                   // fresh entity restarts at 0
  }

  test("sessionize ≡ session_window: row-level sessions aggregate to the window form") {
    // grouping the row-level ordinals must reproduce the aggregate
    // session query exactly — the two forms are one semantics
    val sf = "/root/testdata/sf0.001"
    val fromRows = graft.Queries.all("window_sessionize")(spark, sf)
      .groupBy("user_id", "session_seq")
      .agg(min("ts_us").as("session_start_us"), count(lit(1)).as("n_events"))
      .select("session_start_us", "user_id", "n_events")
      .collect().toSet
    val fromWindow = graft.Queries.all("window_session")(spark, sf)
      .select("session_start_us", "user_id", "n_events")
      .collect().toSet
    assert(fromRows == fromWindow)
  }

  test("asofJoinTolerance with a huge bound degenerates to plain asofJoin") {
    val left = Seq(("X", 1), ("X", 5), ("X", 9)).toDF("indicator", "t")
    val right = Seq(("X", 2, 20.0), ("X", 4, 40.0)).toDF("indicator", "t", "v")
    val plain = SeriesOps.asofJoin(left, right, Seq("indicator"), "t", "v")
      .collect().toSet
    val tol = SeriesOps.asofJoinTolerance(left, right, Seq("indicator"),
        "t", "v", tolerance = Long.MaxValue)
      .collect().toSet
    assert(plain == tol)
  }

  test("transitionCounts: per-origin step counts and shares") {
    val ev = Seq(
      (1L, "a", 1L), (1L, "b", 2L), (1L, "a", 3L), (1L, "b", 4L),
      (2L, "a", 1L), (2L, "c", 2L)
    ).toDF("user_id", "state", "seq")
    val out = SeriesOps.transitionCounts(ev, "user_id", "state", Seq("seq"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // origin a: a→b twice, a→c once → shares 2/3 and 1/3 (4-dp)
    assert(out(("a", "b")) == ((2L, 0.6667)))
    assert(out(("a", "c")) == ((1L, 0.3333)))
    assert(out(("b", "a")) == ((1L, 1.0)))
    assert(!out.contains(("b", null))) // terminal steps excluded
  }

  test("sequenceFunnel: strictly-later ordered chains, step conversion rates") {
    val ev = Seq(
      (1L, "view", 1L), (1L, "click", 2L), (1L, "buy", 3L),  // full chain
      (2L, "click", 1L), (2L, "view", 2L),                   // click BEFORE view
      (3L, "view", 1L), (3L, "buy", 2L),                     // skips click
      (4L, "view", 1L), (4L, "click", 1L), (4L, "buy", 5L),  // tie: not LATER
      (5L, "buy", 1L)                                        // never views
    ).toDF("user_id", "event_type", "ts")
    val out = SeriesOps.sequenceFunnel(ev, "user_id", "event_type", "ts",
        Seq("view", "click", "buy"))
      .select("step_idx", "step", "n_users", "conv_pct")
      .as[(Int, String, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    assert(out(1) == ((1, "view", 4L, None)))          // users 1-4
    assert(out(2) == ((2, "click", 1L, Some(0.25))))   // only user 1
    assert(out(3) == ((3, "buy", 1L, Some(1.0))))
    // a user whose late re-view enables a later click still converts:
    // greedy earliest first-times are optimal, not order-fragile
    val ev2 = Seq((7L, "view", 1L), (7L, "click", 5L), (7L, "view", 9L),
      (7L, "buy", 6L)).toDF("user_id", "event_type", "ts")
    val n3 = SeriesOps.sequenceFunnel(ev2, "user_id", "event_type", "ts",
      Seq("view", "click", "buy")).filter(col("step_idx") === 3)
      .select("n_users").as[Long].head()
    assert(n3 == 1L) // view@1 < click@5 < buy@6
  }

  test("cohortRetention: first-month cohorts, month offsets, cohort-normalized cells") {
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val ev = Seq(
      (1L, ts("2024-01-05 10:00:00")), (1L, ts("2024-01-20 11:00:00")),
      (1L, ts("2024-02-02 09:00:00")), (1L, ts("2024-04-15 12:00:00")),
      (2L, ts("2024-01-31 23:00:00")),
      (3L, ts("2024-02-10 08:00:00")), (3L, ts("2024-04-01 00:00:00"))
    ).toDF("user_id", "ts")
    val out = SeriesOps.cohortRetention(ev, "user_id", "ts")
      .select(col("cohort").cast("string"), col("offset"),
        col("n_active"), col("retained_pct"))
      .as[(String, Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // Jan cohort {1,2}: offset 0 both, offset 1 only u1, offset 3 only u1
    assert(out(("2024-01-01 00:00:00", 0L)) == ((2L, 1.0)))
    assert(out(("2024-01-01 00:00:00", 1L)) == ((1L, 0.5)))
    assert(out(("2024-01-01 00:00:00", 3L)) == ((1L, 0.5)))
    // Feb cohort {3}: offsets 0 and 2, fully retained
    assert(out(("2024-02-01 00:00:00", 0L)) == ((1L, 1.0)))
    assert(out(("2024-02-01 00:00:00", 2L)) == ((1L, 1.0)))
    assert(out.size == 5, s"unexpected cells: ${out.keySet}")
  }
}
