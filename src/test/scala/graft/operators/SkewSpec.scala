package graft.operators

import org.apache.spark.sql.functions._
import graft.SparkSpec

class SkewSpec extends SparkSpec {
  import spark.implicits._

  // hot key "H" carries 90% of rows
  private val skewed = ((1 to 180).map(i => ("H", i.toLong, i.toDouble)) ++
    (1 to 20).map(i => ("C", i.toLong, i.toDouble * 2))).toDF("k", "id", "value")

  test("saltedMeanCount equals the direct aggregate") {
    val direct = skewed.groupBy("k")
      .agg(avg("value").as("value"), count("value").as("observation_count"))
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val salted = Skew.saltedMeanCount(skewed, Seq("k"), col("id"), salts = 8)
      .as[(String, Double, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    assert(salted.keySet == direct.keySet)
    salted.foreach { case (k, (v, c)) =>
      val (dv, dc) = direct(k)
      assert(c == dc && math.abs(v - dv) < 1e-9, s"key $k: ($v,$c) vs ($dv,$dc)")
    }
  }

  test("saltedAgg plans two exchanges (split stage + merge stage)") {
    val plan = Skew.saltedMeanCount(skewed, Seq("k"), col("id"), salts = 8)
      .queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2,
      s"expected salt + merge shuffles:\n$plan")
  }

  test("saltedJoin equals the plain join, including unmatched-key handling") {
    val right = Seq(("H", "hot"), ("C", "cold"), ("X", "unused")).toDF("k", "label")
    val plain = skewed.join(right, Seq("k")).select("k", "id", "label")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    val salted = Skew.saltedJoin(skewed, right, Seq("k"), col("id"), salts = 4)
      .select("k", "id", "label")
      .as[(String, Long, String)].collect().sortBy(r => (r._1, r._2))
    assert(salted.toSeq == plain.toSeq)
    // left join keeps left rows whose key is absent on the right
    val leftOnly = skewed.withColumn("k", lit("Z"))
    val lj = Skew.saltedJoin(leftOnly, right, Seq("k"), col("id"), salts = 4, "left")
    assert(lj.count() == 200 && lj.filter(col("label").isNull).count() == 200)
  }

  test("saltedJoin rejects right/full join types (replicated right side)") {
    val right = Seq(("H", "hot")).toDF("k", "label")
    for (jt <- Seq("right", "right_outer", "full", "full_outer", "outer")) {
      val e = intercept[IllegalArgumentException] {
        Skew.saltedJoin(skewed, right, Seq("k"), col("id"), salts = 4, jt)
      }
      assert(e.getMessage.contains("left-preserving"), s"joinType $jt")
    }
    // left-preserving aliases still pass the guard
    assert(Skew.saltedJoin(skewed, right, Seq("k"), col("id"), 4, "left_semi").count() == 180)
    assert(Skew.saltedJoin(skewed, right, Seq("k"), col("id"), 4, "anti").count() == 20)
  }

  test("salts are deterministic (no rand): same input, same split") {
    val a = skewed.withColumn("s", pmod(hash(col("id")), lit(8))).select("id", "s")
      .as[(Long, Int)].collect().toMap
    val b = skewed.withColumn("s", pmod(hash(col("id")), lit(8))).select("id", "s")
      .as[(Long, Int)].collect().toMap
    assert(a == b)
  }
}
