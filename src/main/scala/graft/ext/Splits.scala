package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines.
  *
  * `randomSplit` re-rolls membership whenever the data is re-read,
  * repartitioned, or appended to — unacceptable for train/val/test
  * hygiene, where a document must land in the same split for the
  * lifetime of the corpus. The stable alternative: bucket each row by a
  * cryptographic hash of its KEY (not its position), then map bucket
  * ranges to named splits. Per-row, codegen'd, no shuffle, no state;
  * appending data or scaling the cluster never moves an existing row,
  * and a salt change re-rolls every assignment at once.
  *
  * md5 (not xxhash) so the assignment is engine-portable: any system
  * that can md5 a string — including the DuckDB oracle — reproduces the
  * exact split, which is how downstream consumers audit membership.
  */
object Splits {

  /** Stable bucket in [0, 100): top 60 bits of md5(key‖salt) mod 100. */
  def hashBucket(key: Column, salt: String = ""): Column =
    (conv(substring(md5(concat(key.cast("string"), lit(salt))), 1, 15), 16, 10)
      .cast("long") % 100).cast("int")

  /** Add `bucket` and `split` columns. `weights` are (name, percent)
    * in order; percents must sum to 100. E.g.
    * `Seq("train" -> 80, "val" -> 10, "test" -> 10)`. */
  def assign(df: DataFrame, keyCol: String,
      weights: Seq[(String, Int)], salt: String = ""): DataFrame = {
    require(weights.nonEmpty && weights.map(_._2).sum == 100,
      "split percents must sum to 100")
    require(weights.forall(_._2 > 0), "every split needs a positive percent")
    val bucket = hashBucket(col(keyCol), salt)
    val cumulative = weights.scanLeft(0)(_ + _._2).tail
    // CASE bucket < c1 THEN name1 WHEN bucket < c2 THEN name2 … chain
    val split = weights.zip(cumulative).reverse
      .foldLeft(lit(weights.last._1)) { case (acc, ((name, _), upper)) =>
        when(bucket < upper, lit(name)).otherwise(acc)
      }
    df.withColumn("bucket", bucket).withColumn("split", split)
  }

  /** Post-audit split repair: the leakage audit (cross-split near-dup
    * pairs) finds eval contamination; this moves it out. Every
    * connected component of the near-dup pair graph whose members
    * span more than one split is reassigned WHOLE to `sinkSplit` —
    * the only policy that guarantees zero cross-split near-dup pairs
    * afterwards (moving individual pair members leaks transitively:
    * pulling the val member of a train/val pair into train breaks
    * whatever val/val pair it was also part of). Docs in no pair, and
    * components already inside one split, keep their assignment —
    * repair never touches clean docs. Moving TO train (the default
    * sink) preserves eval purity without deleting tokens; eval sets
    * shrink by exactly the contaminated docs.
    *
    * Output: the assigned frame plus `moved` and `split_repaired`.
    * Post-condition (spec-pinned): re-running the leakage audit on
    * `split_repaired` returns zero rows.
    *
    * Scale shape: components via the O(log n) star-contraction CC
    * over the already-bounded pair set; the span check is one
    * component-keyed aggregate (distinct-split count ≤ |splits|);
    * one join back per doc. Linear in |pairs| + |docs| — no new pair
    * generation, no quadratic step. */
  def repairLeakage(assigned: DataFrame, pairs: DataFrame,
      keyCol: String = "doc_id", sinkSplit: String = "train"): DataFrame = {
    val comp = graft.operators.ConnectedComponents
      .run(pairs.select(col("id_a").as("src"), col("id_b").as("dst")),
        "src", "dst")
      .toDF("__node", "__comp")
    val withComp = assigned
      .join(comp, assigned(keyCol) === col("__node"), "left")
      .drop("__node")
    val spanning = withComp.filter(col("__comp").isNotNull)
      .groupBy("__comp").agg(countDistinct(col("split")).as("__ns"))
      .filter(col("__ns") > 1)
      .select(col("__comp"), lit(true).as("__move"))
    withComp.join(spanning, Seq("__comp"), "left")
      .withColumn("moved",
        coalesce(col("__move"), lit(false)) && col("split") =!= sinkSplit)
      .withColumn("split_repaired",
        when(col("moved"), lit(sinkSplit)).otherwise(col("split")))
      .drop("__comp", "__move")
  }
}
