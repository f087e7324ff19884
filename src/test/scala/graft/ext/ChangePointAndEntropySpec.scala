package graft.ext

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Hand-computed fixtures for the change-point argmax and the dyadic
  * entropy signal: planted mean shifts land exactly, degenerate
  * series behave, and the entropy integers match pencil-and-paper.
  */
class ChangePointAndEntropySpec extends SparkSpec {
  import spark.implicits._

  private def cp(rows: Seq[(String, Int, Double)]) =
    SeriesOps.changePoint(rows.toDF("k", "o", "value"), "k", "o", "value")

  test("planted mean shift: split lands exactly at the jump") {
    val series = (1 to 10).map(("s", _, 1.0)) ++ (11 to 20).map(("s", _, 5.0))
    val r = cp(series).select("split_o", "n_before", "n_after",
        "mean_before", "mean_after")
      .as[(Int, Long, Long, Double, Double)].head()
    assert(r == ((10, 10L, 10L, 1.0, 5.0)))
  }

  test("flat series: all scores zero, tie breaks to the earliest split") {
    val r = cp((1 to 6).map(("s", _, 2.0)))
      .select("split_o", "score").as[(Int, Double)].head()
    assert(r == ((1, 0.0)))
  }

  test("single-point series emit no row; multi-series stay independent") {
    val rows = Seq(("lonely", 1, 9.0)) ++
      ((1 to 4).map(("a", _, 0.0)) ++ (5 to 8).map(("a", _, 10.0))) ++
      ((1 to 4).map(("b", _, 10.0)) ++ (5 to 8).map(("b", _, 0.0)))
    val out = cp(rows).select("k", "split_o").as[(String, Int)].collect().toMap
    assert(out == Map("a" -> 4, "b" -> 4))
  }

  test("shift magnitude dominates a same-length weaker shift in score") {
    val strong = cp((1 to 6).map(("s", _, 0.0)) ++ (7 to 12).map(("s", _, 8.0)))
      .select("score").as[Double].head()
    val weak = cp((1 to 6).map(("s", _, 0.0)) ++ (7 to 12).map(("s", _, 2.0)))
      .select("score").as[Double].head()
    // gain scales with (Δμ)²: 16× here
    assert(math.abs(strong / weak - 16.0) < 1e-9)
  }

  test("Theil–Sen: exact slope on a clean line; one outlier cannot drag it") {
    val clean = Seq(("s", 1, 1.0), ("s", 2, 3.0), ("s", 3, 5.0))
      .toDF("k", "o", "value")
    val r = SeriesOps.theilSen(clean, "k", "o", "value")
      .select("n_pairs", "slope_median").as[(Long, Double)].head()
    assert(r == ((3L, 2.0)))
    // slopes of (0,1,2,100 at days 1..4): [1,1,1,33.33,49.5,98] →
    // lower median (rn 3 of 6) = 1.0; OLS slope here is ≈ 30
    val dirty = Seq(("s", 1, 0.0), ("s", 2, 1.0), ("s", 3, 2.0),
      ("s", 4, 100.0)).toDF("k", "o", "value")
    val m = SeriesOps.theilSen(dirty, "k", "o", "value")
      .select("slope_median").as[Double].head()
    assert(m == 1.0, s"outlier dragged the median slope to $m")
  }

  test("dyadic entropy: repeated, uniform, and mixed token fixtures") {
    val docs = Seq(
      (0L, "a a a a"),      // N=4 ⌊lg⌋=2, c=4 ⌊lg⌋=2 → bits 8−8 = 0
      (1L, "a b c d"),      // N=4: 8 − 4·0 = 8 → 2 bits/token
      (2L, "a a b"),        // N=3 ⌊lg⌋=1: 3 − (2·1+0) = 1 → 1/3
      (3L, "")              // no tokens → dropped
    ).toDF("doc_id", "text")
    val out = TextOps.entropySignals(docs)
      .select("doc_id", "n_tokens", "n_distinct", "sum_bits", "low_entropy")
      .as[(Long, Long, Long, Long, Boolean)].collect().toSet
    assert(out == Set(
      (0L, 4L, 1L, 0L, true),
      (1L, 4L, 4L, 8L, false),
      (2L, 3L, 2L, 1L, true)))
    val e2 = TextOps.entropySignals(docs).filter(col("doc_id") === 2)
      .select("entropy").as[Double].head()
    assert(math.abs(e2 - 1.0 / 3.0) < 1e-15)
  }

  test("entropy gate is monotone: shuffling tokens never changes it") {
    val docs = Seq((0L, "x y x z x y"), (1L, "y x z x y x"))
      .toDF("doc_id", "text")
    val out = TextOps.entropySignals(docs)
      .select("n_tokens", "n_distinct", "sum_bits")
      .as[(Long, Long, Long)].collect().toSet
    assert(out.size == 1, "entropy is a bag statistic — order-blind")
  }
}
