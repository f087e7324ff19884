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
}
