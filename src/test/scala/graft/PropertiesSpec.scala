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
}
