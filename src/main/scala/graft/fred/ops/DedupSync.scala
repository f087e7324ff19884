package graft.fred.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.broadcast

/** D1 — dedup-against-sink: append only rows whose natural key is not
  * already present in the sink.
  *
  * The reference materializes the sink's key set in memory and loops
  * (`load_fred_data_to_google.py:108-119`); the scalable equivalent is a
  * LEFT ANTI join on the key columns. The sink side (existing keys) is
  * small relative to the lake — broadcast it so the anti-join is
  * shuffle-free on the (large) incoming side.
  */
object DedupSync {

  /** Rows of `incoming` whose key is absent from `existing`. */
  def newRows(incoming: DataFrame, existing: DataFrame,
      keys: Seq[String] = graft.fred.Schemas.servingKey,
      broadcastExisting: Boolean = true): DataFrame = {
    val existingKeys = existing.select(keys.head, keys.tail: _*).distinct()
    val right = if (broadcastExisting) broadcast(existingKeys) else existingKeys
    incoming.join(right, keys, "left_anti")
  }
}
