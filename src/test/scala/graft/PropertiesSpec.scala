package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.fred.ops.{Clean, Merge, MonthlyAgg}

/** Property-based invariants (SURVEY §5.3): the algebraic laws that
  * make the engine's aggregates safe to distribute — partial-aggregate
  * decomposability (union-then-agg ≡ agg-then-merge), count bounds,
  * clean-chain monotonicity, upsert idempotence.
  *
  * Plain ScalaCheck generators sampled under fixed seeds (the
  * scalatest bridge isn't in the offline cache; determinism is a
  * feature here anyway).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](gen: Gen[A], n: Int): Seq[A] =
    (1 to n).map(i => gen(Gen.Parameters.default, Seed(i.toLong))
      .getOrElse(sys.error("generator failed")))

  private def forAllSamples[A](gen: Gen[A], n: Int)(body: A => Unit): Unit =
    samples(gen, n).foreach(body)

  private val obsGen: Gen[List[(String, Int, Option[Double])]] = Gen.listOfN(40,
    for {
      ind <- Gen.oneOf("A", "B")
      month <- Gen.choose(1, 3)
      value <- Gen.option(Gen.choose(-100.0, 100.0))
    } yield (ind, month, value))

  private def toDf(rows: List[(String, Int, Option[Double])]) =
    rows.toDF("indicator", "observation_month", "value")
      .withColumn("observation_year", lit(2024))
      .withColumn("ingested_at", concat(lit("t"), col("observation_month")))

  test("A1 is decomposable: agg(a ∪ b) ≡ merge(agg(a), agg(b))") {
    forAllSamples(Gen.zip(obsGen, obsGen), 10) { case (a, b) =>
      val whole = MonthlyAgg.aggregate(toDf(a ++ b))
        .select("indicator", "observation_month", "value", "observation_count")
        .as[(String, Int, Option[Double], Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      // merge partials: count-weighted mean, summed counts, max stamp
      val partials = MonthlyAgg.aggregate(toDf(a))
        .unionByName(MonthlyAgg.aggregate(toDf(b)))
      val merged = partials
        .groupBy("indicator", "observation_month")
        .agg(
          (sum(col("value") * col("observation_count")) /
            sum(when(col("value").isNotNull, col("observation_count"))))
            .as("value"),
          sum("observation_count").as("observation_count"))
        .as[(String, Int, Option[Double], Long)].collect()
        .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
      assert(merged.keySet == whole.keySet)
      whole.foreach { case (k, (v, c)) =>
        val (mv, mc) = merged(k)
        assert(mc == c, s"$k count: merged $mc vs whole $c")
        (v, mv) match {
          case (Some(x), Some(y)) => assert(math.abs(x - y) < 1e-9, s"$k mean")
          case (None, None) =>
          case other => fail(s"$k mean nullability mismatch: $other")
        }
      }
    }
  }

  test("A1 bounds: observation_count ≤ group rows; null-only groups have null mean") {
    forAllSamples(obsGen, 10) { rows =>
      val out = MonthlyAgg.aggregate(toDf(rows))
        .select("indicator", "observation_month", "value", "observation_count")
        .as[(String, Int, Option[Double], Long)].collect()
      val inputSizes = rows.groupBy(r => (r._1, r._2)).view.mapValues(_.size).toMap
      out.foreach { case (ind, m, v, c) =>
        assert(c <= inputSizes((ind, m)))
        val nonNull = rows.count(r => r._1 == ind && r._2 == m && r._3.isDefined)
        assert(c == nonNull)
        assert(v.isDefined == (nonNull > 0))
      }
    }
  }

  private val rawGen: Gen[List[String]] = Gen.listOfN(30,
    Gen.oneOf(Gen.const("."), Gen.const("garbage"), Gen.const(null: String),
      Gen.choose(-10.0, 10.0).map(_.toString)))

  test("clean chain: output ⊆ parsable inputs, exactly the parsable count") {
    forAllSamples(rawGen, 10) { raws =>
      val df = raws.zipWithIndex.map { case (v, i) => (i, v) }.toDF("id", "value")
      val out = Clean.cleanValues(df).as[(Int, Double)].collect()
      val parsable = raws.count(v =>
        v != null && v != "." && scala.util.Try(v.toDouble).isSuccess)
      assert(out.length == parsable)
      out.foreach { case (i, d) => assert(raws(i).toDouble == d) }
    }
  }

  private val weightsGen: Gen[List[Int]] = for {
    n <- Gen.choose(2, 4)
    cuts <- Gen.listOfN(n - 1, Gen.choose(1, 99))
  } yield {
    val distinct = cuts.distinct.sorted
    ((0 +: distinct) :+ 100).sliding(2).map(p => p(1) - p(0)).toList.filter(_ > 0)
  }

  test("splits partition the corpus: every key in exactly one split, ranges exact") {
    forAllSamples(Gen.zip(weightsGen, Gen.choose(0L, 10000L)), 10) { case (ws, base) =>
      val weights = ws.zipWithIndex.map { case (w, i) => s"s$i" -> w }
      val docs = (base until base + 300L).toDF("doc_id")
      val out = graft.ext.Splits.assign(docs, "doc_id", weights, salt = "p")
        .select("doc_id", "bucket", "split").as[(Long, Int, String)].collect()
      assert(out.length == 300, "no row lost or duplicated")
      val cumulative = weights.scanLeft(0)(_ + _._2).tail
      out.foreach { case (_, b, s) =>
        val expected = weights.zip(cumulative).collectFirst {
          case ((name, _), upper) if b < upper => name
        }.get
        assert(s == expected, s"bucket $b mapped to $s, expected $expected")
      }
      // invariant to partitioning: repartitioned input, same assignment
      val shuffled = graft.ext.Splits.assign(docs.repartition(7), "doc_id", weights, "p")
        .select("doc_id", "split").as[(Long, String)].collect().toMap
      assert(out.forall { case (id, _, s) => shuffled(id) == s })
    }
  }

  private val packDocsGen: Gen[List[Int]] =
    Gen.listOfN(60, Gen.choose(1, 400))

  test("packing conserves docs and starts pack p exactly at preceding total ≥ p·budget") {
    forAllSamples(Gen.zip(packDocsGen, Gen.choose(200, 600)), 10) { case (tokens, budget) =>
      val docs = tokens.zipWithIndex.map { case (t, i) => (i.toLong, "g", t) }
        .toDF("doc_id", "grp", "n")
      val out = graft.ext.Packing.packByBudget(docs, Seq("grp"), Seq("doc_id"),
          col("n"), budget)
        .select("doc_id", "n_tokens", "pack_id")
        .as[(Long, Long, Long)].collect().sortBy(_._1)
      assert(out.length == tokens.length, "every doc packed exactly once")
      // the law: pack = floor(preceding_total / budget). (Pack ids may
      // legitimately skip values when one doc spans multiple budgets.)
      var cum = 0L
      out.foreach { case (_, n, p) =>
        assert(p == cum / budget, s"pack of doc with preceding total $cum")
        cum += n
      }
      assert(out.head._3 == 0L, "packing starts at pack 0")
    }
  }

  private val corpusGen: Gen[List[String]] = {
    val word = Gen.oneOf("alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta")
    Gen.listOfN(30, Gen.choose(3, 12).flatMap(k =>
      Gen.listOfN(k, word).map(_.mkString(" "))))
  }

  test("decontamination partitions train: clean ∪ flagged = train, disjoint") {
    forAllSamples(Gen.zip(corpusGen, corpusGen), 8) { case (trainTexts, benchTexts) =>
      val train = trainTexts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val bench = benchTexts.zipWithIndex.map { case (t, i) => (1000L + i, t) }
        .toDF("doc_id", "text")
      val flagged = graft.ext.Decontam.overlapStats(train, bench, "doc_id", "text", n = 3)
        .select("doc_id").as[Long].collect().toSet
      val clean = graft.ext.Decontam.clean(train, bench, "doc_id", "text", n = 3)
        .select("doc_id").as[Long].collect().toSet
      assert((flagged intersect clean).isEmpty)
      assert((flagged union clean) == (0L until trainTexts.length.toLong).toSet)
    }
  }

  test("upsert idempotence: applying the same delta twice changes nothing") {
    forAllSamples(obsGen, 5) { rows =>
      val base = toDf(rows).withColumn("seq", lit(0))
      val delta = toDf(rows.take(rows.size / 2)).withColumn("seq", lit(1))
      val keys = Seq("indicator", "observation_month")
      def once = Merge.upsert(base, delta, keys, Seq(col("seq").desc))
      val twice = Merge.upsert(once, delta, keys, Seq(col("seq").desc))
      // dropDuplicates-free comparison: same multiset of (key, seq)
      val a = once.select("indicator", "observation_month", "seq")
        .as[(String, Int, Int)].collect().sorted.toSeq
      val b = twice.select("indicator", "observation_month", "seq")
        .as[(String, Int, Int)].collect().sorted.toSeq
      assert(a == b)
    }
  }

  // ------------------------------------------------- round-8 operators

  test("Morton interleave is invertible: deinterleave(z) recovers (x, y)") {
    def deinterleave(z: Long, bits: Int): (Long, Long) = {
      var (x, y, i) = (0L, 0L, 0)
      while (i < bits) {
        x |= ((z >> (2 * i)) & 1L) << i
        y |= ((z >> (2 * i + 1)) & 1L) << i
        i += 1
      }
      (x, y)
    }
    forAllSamples(Gen.listOfN(64,
        Gen.zip(Gen.choose(0L, 65535L), Gen.choose(0L, 65535L))), 5) { pts =>
      val rows = pts.toDF("x", "y")
      val out = rows.select(col("x"), col("y"),
          graft.operators.ZOrder.interleave(col("x"), col("y"), 16).as("z"))
        .as[(Long, Long, Long)].collect()
      out.foreach { case (x, y, z) =>
        assert(deinterleave(z, 16) == ((x, y)), s"z=$z did not invert")
      }
    }
  }

  test("gopherKeep ≡ gopherSignals.keep on random word-soup docs") {
    val docGen = Gen.listOfN(30, for {
      n <- Gen.choose(1, 80)
      words <- Gen.listOfN(n, Gen.oneOf(
        "the", "and", "word", "data", "123", "#", "abcdefghijklmn", "x"))
    } yield words.mkString(" "))
    forAllSamples(docGen, 5) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val viaSignals = graft.ext.TextOps.gopherSignals(docs)
        .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap
      val viaKeep = docs.select(col("doc_id"),
          graft.ext.TextOps.gopherKeep(col("text")).as("keep"))
        .as[(Long, Boolean)].collect().toMap
      assert(viaSignals == viaKeep)
    }
  }

  test("whitespace-formatting invariance: messy ≡ clean across the text stack") {
    // random docs with random whitespace runs between words must give
    // byte-identical results to their single-spaced twins for every
    // tokenization-derived operator (the r9 contract: formatting is
    // noise, words are signal)
    val wsGen = Gen.oneOf(" ", "  ", "\t", " \t ", "\n", "   ")
    val docGen = Gen.listOfN(20, for {
      n <- Gen.choose(3, 30)
      words <- Gen.listOfN(n, Gen.oneOf(
        "the", "and", "of", "data", "pipeline", "word", "123", "x"))
      seps <- Gen.listOfN(n - 1, wsGen)
      lead <- Gen.oneOf("", " ", "\t")
      trail <- Gen.oneOf("", " ", "\n")
    } yield (
      lead + words.head + seps.zip(words.tail).map { case (s, w) => s + w }.mkString + trail,
      words.mkString(" ")))
    forAllSamples(docGen, 3) { docs =>
      val messy = docs.map(_._1).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val clean = docs.map(_._2).zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      def gopher(df: org.apache.spark.sql.DataFrame) =
        graft.ext.TextOps.gopherSignals(df, minWords = 2)
          .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(gopher(messy) == gopher(clean), "gopher signals diverged")
      def clusters(df: org.apache.spark.sql.DataFrame) =
        graft.ext.Dedup.minhashClusters(df, "doc_id", "text")
          .as[(Long, Long)].collect().toSet
      assert(clusters(messy) == clusters(clean), "minhash clusters diverged")
      def rep(df: org.apache.spark.sql.DataFrame) =
        graft.ext.TextOps.repetitionSignals(df)
          .as[(Long, Long, Long, Double)].collect().toSet
      assert(rep(messy) == rep(clean), "repetition signals diverged")
    }
  }

  test("bloom decontamination ≡ exact decontamination on random corpora") {
    val corpusGen = for {
      nTrain <- Gen.choose(5, 20)
      train <- Gen.listOfN(nTrain, Gen.listOfN(8,
        Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
        .map(_.mkString(" ")))
      nBench <- Gen.choose(1, 5)
      bench <- Gen.listOfN(nBench, Gen.listOfN(8,
        Gen.oneOf("alpha", "beta", "gamma", "delta", "eps", "zeta"))
        .map(_.mkString(" ")))
    } yield (train, bench)
    forAllSamples(corpusGen, 5) { case (train, bench) =>
      val trainDf = train.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val benchDf = bench.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val exact = graft.ext.Decontam
        .overlapStats(trainDf, benchDf, "doc_id", "text", n = 5)
        .as[(Long, Int, Long, Double)].collect().toSet
      val bloom = graft.ext.Decontam
        .overlapStatsBloom(trainDf, benchDf, "doc_id", "text", n = 5,
          mBits = 1 << 10, kProbes = 3)
        .as[(Long, Int, Long, Double)].collect().toSet
      assert(bloom == exact, "bloom path diverged from exact relation")
    }
  }

  test("span dedup conserves spans: every distinct span survives exactly once") {
    // the whole-corpus law: dedup keeps the (doc, pos)-first occurrence
    // of each distinct span and nothing else, so Σ n_kept ≡ |distinct
    // spans| and the kept text, re-tokenized, reproduces that set
    val corpusGen = Gen.listOfN(12, Gen.listOfN(9,
      Gen.oneOf("a", "b", "c", "d")).map(_.mkString(" ")))
    forAllSamples(corpusGen, 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.ext.Dedup
        .spanDedupByTokens(docs, "doc_id", "text", spanTokens = 3)
      // 9-token docs cut into exactly three 3-token windows (and kept
      // text re-windows exactly, since every kept span is 3 tokens)
      val spanSet = docs
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, 7, 3), s -> " +
            "array_join(slice(split(text, ' '), s, 3), ' '))")).as("span"))
        .select("span").distinct().count()
      val keptSum = out.agg(sum("n_kept")).head().getLong(0)
      assert(keptSum == spanSet,
        s"kept $keptSum spans, corpus has $spanSet distinct")
      // and re-tokenizing the kept text yields pairwise-disjoint spans
      val rekept = out.filter(col("n_kept") > 0)
        .select(explode(expr(
          "transform(sequence(1, size(split(text_dedup, ' ')), 3), s -> " +
            "array_join(slice(split(text_dedup, ' '), s, 3), ' '))")).as("span"))
      assert(rekept.count() == rekept.distinct().count(),
        "kept spans must be globally unique")
    }
  }

  test("star-contraction CC ≡ union-find on random graphs (r10 algorithm swap)") {
    // the law the O(log n) rewrite must preserve: for ANY edge set,
    // every node appearing in an edge gets the minimum id reachable
    // from it — checked against a driver-side union-find on random
    // multigraphs (duplicate edges, self-loops, both orientations,
    // disconnected remainders all included by construction)
    val graphGen = for {
      nNodes <- Gen.choose(2, 40)
      nEdges <- Gen.choose(1, 60)
      edges <- Gen.listOfN(nEdges,
        Gen.zip(Gen.choose(0L, nNodes.toLong), Gen.choose(0L, nNodes.toLong)))
    } yield edges
    forAllSamples(graphGen, 12) { edges =>
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val expected = edges.flatMap(e => Seq(e._1, e._2)).distinct
        .map(n => n -> find(n)).toMap
      val got = graft.operators.ConnectedComponents
        .run(edges.toDF("src", "dst"), "src", "dst")
        .as[(Long, Long)].collect().toMap
      assert(got == expected,
        s"CC labels diverge from union-find on edges $edges")
    }
  }

  test("two-level quantizer assignment: total, center-valued, dup-co-locating") {
    // laws that hold for ANY corpus and k (no separation assumptions,
    // unlike the unambiguous-fixture equivalence spec): every id
    // assigned exactly once, every cluster label is a center id (one
    // of the nCenters smallest-md5 ids — recomputed here), and exact
    // duplicate vectors always land in the same cluster
    val corpusGen = for {
      n <- Gen.choose(4, 24)
      k <- Gen.choose(1, 12)
      vecs <- Gen.listOfN(n, Gen.listOfN(3, Gen.choose(-5, 5)))
    } yield (k, vecs.zipWithIndex.map { case (v, i) =>
      (i.toLong, v.map(_.toFloat + 0.5f).toArray)
    })
    forAllSamples(corpusGen, 10) { case (k, rows) =>
      val df = rows.toDF("vec_id", "embedding")
      val out = graft.ext.SemDedup
        .assignTwoLevel(df, "vec_id", "embedding", nCenters = k)
        .select($"id".as[Long], $"cluster".as[Long]).collect()
      assert(out.map(_._1).sorted.toSeq == rows.map(_._1).sorted,
        "every vector assigned exactly once")
      def md5hex(s: String) = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
      val centers = rows.map(_._1).sortBy(id => (md5hex(id.toString), id))
        .take(k).toSet
      assert(out.forall(r => centers(r._2)),
        s"cluster labels must be min-md5 center ids; got ${out.toSeq}")
      val byVec = rows.groupBy(_._2.toSeq).values.filter(_.size > 1)
      val cluster = out.toMap
      byVec.foreach { dups =>
        assert(dups.map(d => cluster(d._1)).distinct.size == 1,
          "exact duplicate vectors must co-locate")
      }
    }
  }

  test("boilerplate signals ≡ driver-side df recomputation on random corpora") {
    // independent oracle: recompute distinct trigrams and their corpus
    // document frequency in plain Scala, then every per-doc signal
    val corpusGen = Gen.listOfN(25, Gen.choose(0, 12).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("a", "b", "c", "d", "e")).map(_.mkString(" "))))
    forAllSamples(corpusGen, 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val grams = texts.map(t => t.split("\\s+").filter(_.nonEmpty).toSeq)
        .map(ws => ws.sliding(3).filter(_.size == 3).map(_.mkString(" ")).toSet)
      val df = grams.flatten.groupBy(identity).view.mapValues(_.size).toMap
      val out = graft.ext.TextOps
        .boilerplateSignals(docs, minDocFreq = 2, maxBoilerPct = 60)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      texts.indices.foreach { i =>
        val g = grams(i)
        val boiler = g.count(df(_) >= 2).toLong
        val r = out(i.toLong)
        assert(r.getAs[Long]("n_grams") == g.size.toLong, s"doc $i n_grams")
        assert(r.getAs[Long]("n_boiler") == boiler, s"doc $i n_boiler")
        assert(r.getAs[Boolean]("keep") == (100L * boiler <= 60L * g.size),
          s"doc $i keep")
      }
    }
  }

  test("top-gram share ≡ driver-side occurrence count on random corpora") {
    // independent oracle: count bigram occurrences per doc in plain
    // Scala; the operator's top pick must match under the count-desc,
    // gram-asc tiebreak
    val corpusGen = Gen.listOfN(20, Gen.choose(0, 15).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf("x", "y", "z", "w")).map(_.mkString(" "))))
    forAllSamples(corpusGen, 8) { texts =>
      val docs = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val out = graft.ext.TextOps.topGramShare(docs)
        .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
      texts.indices.foreach { i =>
        val ws = texts(i).split("\\s+").filter(_.nonEmpty).toSeq
        val occ = ws.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
        val r = out(i.toLong)
        assert(r.getAs[Long]("n_grams") == occ.size.toLong, s"doc $i n_grams")
        if (occ.nonEmpty) {
          val counts = occ.groupBy(identity).view.mapValues(_.size).toMap
          val (topG, topC) = counts.toSeq.minBy { case (g, c) => (-c, g) }
          assert(r.getAs[String]("top_gram") == topG, s"doc $i top gram")
          assert(r.getAs[Long]("top_count") == topC.toLong, s"doc $i count")
        } else {
          assert(r.getAs[String]("top_gram") == null && r.getAs[Boolean]("keep"))
        }
      }
    }
  }
}
