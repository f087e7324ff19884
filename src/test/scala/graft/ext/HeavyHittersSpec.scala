package graft.ext

import org.apache.spark.sql.functions._
import graft.SparkSpec

/** Pins [[HeavyHitters]]: the Misra–Gries summary guarantee (no false
  * negatives, one-sided error ≤ n/(k+1) after merging) across
  * partitionings, the exact partitioning-independent output of the
  * two-pass form, the eviction path, and the null/empty edges.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // Zipf-ish stream: key i contributes ~ 2000/i rows (i = 1..40), so
  // a handful of keys clear the n/(k+1) bar at k=5 and most do not;
  // 40 distinct keys >> 5 counters forces constant evictions.
  private def zipf(): Seq[String] = {
    val rows = for {
      i <- 1 to 40
      j <- 1 to (2000 / i)
    } yield (s"k$i", i * 100000 + j)
    // deterministic interleave so hot keys are spread, not clustered
    rows.sortBy { case (_, ord) => (ord % 997, ord) }.map(_._1)
  }

  test("summarize: merged summaries keep the MG guarantee under every partitioning") {
    val data = zipf()
    val n = data.size.toLong
    val exact = data.groupBy(identity).map { case (k, v) => (k, v.size.toLong) }
    val k = 5
    for (parts <- Seq(1, 3, 8, 32)) {
      val df = data.toDF("word").repartition(parts)
      val merged = HeavyHitters.summarize(df, "word", k)
        .where(col("key").isNotNull)
        .groupBy("key").agg(sum("est").as("est"))
        .as[(String, Long)].collect().toMap
      val np = HeavyHitters.summarize(df, "word", k)
        .where(col("key").isNull).agg(sum("np")).head().getLong(0)
      assert(np == n, s"partition totals must sum to n ($np vs $n)")
      merged.foreach { case (key, est) =>
        val f = exact(key)
        assert(est <= f, s"$key: est $est > true $f (MG never overcounts)")
        assert((f - est) * (k + 1) <= n,
          s"$key: deficit ${f - est} exceeds n/(k+1) at parts=$parts")
      }
      // no false negatives: every true heavy hitter survives
      exact.foreach { case (key, f) =>
        if (f * (k + 1) > n)
          assert(merged.contains(key),
            s"true heavy hitter $key (f=$f, n=$n) missing at parts=$parts")
      }
    }
  }

  test("heavyHitters: exact output, independent of partitioning") {
    val data = zipf()
    val n = data.size.toLong
    val k = 5
    val expected = data.groupBy(identity)
      .collect { case (key, v) if v.size.toLong * (k + 1) > n =>
        key -> v.size.toLong }
      .toMap
    assert(expected.nonEmpty && expected.size < 40, "fixture sanity")
    for (parts <- Seq(1, 8, 32)) {
      val got = HeavyHitters
        .heavyHitters(data.toDF("word").repartition(parts), "word", k)
        .select("word", "cnt").as[(String, Long)].collect().toMap
      assert(got == expected, s"parts=$parts: $got vs $expected")
    }
  }

  test("null keys are excluded; empty input yields empty output") {
    val df = Seq(Some("a"), None, Some("a"), None, None).toDF("word")
    // nulls don't count toward n (3 nulls dropped, n=2) and never
    // surface as a key
    val out = HeavyHitters.heavyHitters(df, "word", 4)
      .as[(String, Long, Double)].collect()
    assert(out.toSeq == Seq(("a", 2L, 1.0)))
    val empty = HeavyHitters.heavyHitters(
      Seq.empty[String].toDF("word"), "word", 4)
    assert(empty.count() == 0)
  }

  test("non-string keys ride the summary schema") {
    val df = (1 to 100).map(i => if (i <= 60) 7L else i.toLong).toDF("user_id")
    val out = HeavyHitters.heavyHitters(df, "user_id", 3)
      .select("user_id", "cnt").as[(Long, Long)].collect().toMap
    assert(out == Map(7L -> 60L))
  }
}
