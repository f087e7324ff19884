package graft

import org.apache.spark.sql.functions._

/** Pins `agg_approx_percentile`'s sketch against the exact twin.
  *
  * `approx_percentile(…, accuracy)` guarantees a relative rank error
  * of at most 1/accuracy: the returned value's rank r satisfies
  * |r − q·n| ≤ n/accuracy. The estimator's interpolation is
  * engine-specific (hence rows-only at the oracle gate), but the rank
  * bound is the published contract — assert it directly.
  */
class AggSketchSpec extends SparkSpec {

  test("approx_percentile rank error is within the 1/accuracy contract") {
    val s = spark
    import s.implicits._
    val accuracy = 1000
    val n = 9999
    // 3 groups with distinct arithmetic values — ranks are exact
    val df = (1 to n).map(i => ("g" + (i % 3), i.toDouble)).toDF("g", "v")
    val rows = df.groupBy("g")
      .agg(
        approx_percentile(col("v"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(accuracy)).as("approx"),
        sort_array(collect_list(col("v"))).as("vals"))
      .collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      val approx = r.getSeq[Double](1)
      val vals = r.getSeq[Double](2)
      val cnt = vals.length
      assert(approx.length == 3)
      Seq(0.25, 0.5, 0.75).zip(approx).foreach { case (q, a) =>
        // every returned value must be an element of the group
        assert(vals.contains(a), s"q=$q returned $a not in group ${r.getString(0)}")
        val rank = vals.count(_ <= a)
        val err = math.abs(rank - q * cnt)
        assert(err <= cnt.toDouble / accuracy + 1,
          s"q=$q rank error $err exceeds bound for group ${r.getString(0)}")
      }
    }
  }

  test("agg_approx_percentile brackets the exact quartiles tightly at high accuracy") {
    val s = spark
    import s.implicits._
    // at accuracy >= n the sketch is exact up to nearest-element choice:
    // approx (a group element) must sit within one step of the exact
    // interpolated quartile
    val df = (1 to 400).map(i => ("k", i * 0.5)).toDF("g", "v")
    val r = df.groupBy("g")
      .agg(
        percentile(col("v"), array(lit(0.25), lit(0.5), lit(0.75))).as("exact"),
        approx_percentile(col("v"),
          array(lit(0.25), lit(0.5), lit(0.75)), lit(10000)).as("approx"))
      .collect()(0)
    val exact = r.getSeq[Double](1)
    val approx = r.getSeq[Double](2)
    exact.zip(approx).foreach { case (e, a) =>
      assert(math.abs(e - a) <= 0.5, s"approx $a too far from exact $e")
    }
  }
}
