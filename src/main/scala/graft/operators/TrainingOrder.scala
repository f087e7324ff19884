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

  /** Deterministic round-robin SOURCE interleave — the batch-diversity
    * layout: a hash shuffle randomizes example order but can still
    * hand SGD long same-source runs when one source dominates;
    * interleaving strides sources so consecutive positions cycle
    * through them (the data-mixing layout multi-corpus training
    * recipes prescribe: every mini-batch sees every source in
    * proportion). Position arithmetic, not a global sort:
    *
    *   interleave_pos = src_rank · S + source_idx
    *
    * where `src_rank` is the row's stable md5 rank WITHIN its source
    * (one window shuffle on the source key) and `source_idx` the
    * source's alphabetical index in the (bounded, ≤ `maxSources` —
    * THROWS above it) source vocabulary. Positions are strictly
    * increasing per source and collide never; reading in pos order
    * visits sources round-robin until a source exhausts (shorter
    * sources leave gaps — gaps order-preserve, so a sequential
    * trainer just streams). Per-row compute + one bounded broadcast:
    * no global window anywhere. */
  def interleaveBySource(df: DataFrame, keyCol: String, sourceCol: String,
      salt: String = "", maxSources: Int = 10000): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = df.sparkSession
    val srcs = df.select(col(sourceCol).cast("string").as("__src")).distinct()
    val n = srcs.count()
    require(n > 0, "empty input")
    require(n <= maxSources,
      s"$n distinct sources exceeds maxSources=$maxSources — the source " +
      "vocabulary must be bounded (it is the interleave stride)")
    // tiny frame: the single-partition window is over ≤ maxSources rows
    val idx = srcs.withColumn("__sidx",
      row_number().over(Window.orderBy(col("__src"))).cast("long") - 1)
    val rw = Window.partitionBy(col(sourceCol))
      .orderBy(orderKey(col(keyCol), salt, 0).asc, col(keyCol).asc)
    df.withColumn("src_rank", row_number().over(rw).cast("long") - 1)
      .join(broadcast(idx), col(sourceCol).cast("string") === col("__src"))
      .withColumn("source_idx", col("__sidx").cast("int"))
      .withColumn("interleave_pos",
        col("src_rank") * lit(n) + col("__sidx"))
      .drop("__src", "__sidx")
  }
}
