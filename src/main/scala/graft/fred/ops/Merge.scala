package graft.fred.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** D2 — keyed upsert (merge), the dataframe-level semantics of the
  * reference's `INSERT … ON CONFLICT (key) DO UPDATE SET col = EXCLUDED.col`
  * (`load_fred_data.py:49-59`, key at `:121`).
  *
  * `latestByKey` is the pure relational form: given rows carrying a
  * recency ordering, keep exactly the winning row per natural key.
  * Implemented with `row_number` over a key-partitioned window — one
  * shuffle on the key, no driver-side state, spill-safe at any scale.
  * The JDBC side-effecting form lives in [[graft.fred.io.UpsertSink]].
  */
object Merge {

  /** One row per key: the first under `recency` ordering (descending
    * recommended by caller, e.g. `col("event_id").desc`). Ordering must
    * be total per key for deterministic output — pass tiebreak columns.
    */
  def latestByKey(df: DataFrame, keys: Seq[String], recency: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toSeq: _*).orderBy(recency: _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Upsert `delta` onto `base`: delta rows win on key collision,
    * base rows without a delta match survive unchanged. Within each
    * side, callers should pre-deduplicate or rely on `recency`. */
  def upsert(base: DataFrame, delta: DataFrame, keys: Seq[String],
      recency: Seq[Column]): DataFrame = {
    val tagged = base.withColumn("__src", lit(0))
      .unionByName(delta.withColumn("__src", lit(1)))
    latestByKey(tagged, keys, col("__src").desc +: recency).drop("__src")
  }

  /** SCD-type-2 history: instead of keeping only the latest row per
    * key ([[latestByKey]] / the reference's ON CONFLICT overwrite),
    * keep EVERY version with its validity interval — `valid_from` =
    * the row's own event time, `valid_to` = the next version's (null
    * while current), `version` = 1-based ordinal. The warehouse-
    * standard "what did this key say at time t" surface, and the
    * point-in-time lookup is then an as-of join against it.
    *
    * One key-partitioned window (lead + row_number share the single
    * sort) — one shuffle, no driver state, any scale. `orderCols` must
    * totally order versions per key — pass a tiebreak. */
  def scd2History(df: DataFrame, keys: Seq[String], timeCol: String,
      orderCols: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col).toSeq: _*).orderBy(orderCols: _*)
    df.withColumn("valid_from", col(timeCol))
      .withColumn("valid_to", lead(col(timeCol), 1).over(w))
      .withColumn("version", row_number().over(w))
  }
}
