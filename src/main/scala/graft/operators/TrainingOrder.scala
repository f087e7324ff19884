package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic training-order shuffle — the layout op that randomizes
  * EXAMPLE ORDER for SGD, the mirror image of [[ZOrder]] (which
  * clusters for scan locality; training wants anti-locality, so
  * consecutive examples are statistically independent).
  * `orderBy(rand())` re-rolls per run and per retry; this keys the
  * order on md5(key ‖ salt ‖ ':' ‖ epoch) (the [[graft.ext.Splits]]
  * discipline), so:
  *  - the permutation is identical on any cluster size, on re-read,
  *    and under task retry (a lost executor re-derives its shard
  *    bit-identically);
  *  - each epoch is an INDEPENDENT permutation with no data movement
  *    beyond the one shuffle that epoch needs anyway — the key is
  *    recomputed, not stored;
  *  - any engine that can md5 a string audits the exact order (the
  *    oracle replays it), unlike engine-native `xxhash64`/`rand`.
  *
  * Scale shape: [[withOrder]] is per-row codegen'd compute, ZERO
  * shuffle — shard assignment at 100 TB is exactly as parallel as
  * reading. [[layoutByOrder]] adds the one range shuffle a sharded
  * write needs (range-partition on the key, sort within partition):
  * shard files come out in a stable pseudorandom order a sequential
  * trainer can stream. Hex-string keys cost 32 bytes per row in that
  * shuffle; at corpus scale project the key down to its 60-bit prefix
  * (`conv(substr(key,1,15),16,10)`) once portability has been audited.
  */
object TrainingOrder {

  /** The order key: md5 hex of key ‖ salt ‖ ':' ‖ epoch. The ':'
    * separator keeps (key="1", salt="2:") distinct from (key="12",
    * salt=":"‑ish collisions) — epoch always parses unambiguously. */
  private[graft] def orderKey(key: Column, salt: String, epoch: Int): Column =
    md5(concat(key.cast("string"), lit(salt), lit(":" + epoch)))

  /** Adds `shuffle_key` (the hex order key — globally sorting by it IS
    * the epoch's permutation) and `shard` (stable bucket in
    * [0, shards), the top-60-bit mod — which worker/file gets the
    * row). Pure per-row compute, no shuffle. */
  def withOrder(df: DataFrame, keyCol: String, shards: Int,
      salt: String = "", epoch: Int = 0): DataFrame = {
    require(shards > 0, "shards must be positive")
    require(epoch >= 0, "epoch must be non-negative")
    val key = orderKey(col(keyCol), salt, epoch)
    df.withColumn("shuffle_key", key)
      .withColumn("shard",
        (conv(substring(col("shuffle_key"), 1, 15), 16, 10)
          .cast("long") % shards).cast("int"))
  }

  /** The layout write: range-partition on the order key and sort
    * within partitions — each output file is one contiguous slice of
    * the epoch's permutation, so reading files in key order replays
    * the full shuffle and reading any ONE file is an unbiased sample.
    * Same single-shuffle cost as any sorted write ([[ZOrder.layoutByZ]]
    * with the curve replaced by the permutation). */
  def layoutByOrder(df: DataFrame, keyCol: String,
      numPartitions: Int, salt: String = "", epoch: Int = 0): DataFrame =
    withOrder(df, keyCol, shards = numPartitions, salt = salt, epoch = epoch)
      .repartitionByRange(numPartitions, col("shuffle_key"))
      .sortWithinPartitions("shuffle_key")
}
