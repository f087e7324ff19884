package graft.fred.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** H4 — the dedup-append "sheet" sink.
  *
  * The reference's `sync_s3_to_google_sheet`
  * (`load_fred_data_to_google.py:65-135`) reads the sheet's current
  * rows, drops incoming rows whose natural key is already present, and
  * appends the remainder. The sheet API itself cannot exist in this
  * environment, so — like [[FredSource]] — the sink is a trait with an
  * in-memory fake; a real Sheets client implements ONLY the trait.
  *
  * A sheet is a driver-side, bounded serving surface (the reference
  * appends via a row-loop over a client handle), so the collect here is
  * the honest shape — guarded by `maxAppendRows` so a mis-pointed lake
  * scan fails loudly instead of materializing unbounded rows on the
  * driver. The dedup half stays fully distributed: a broadcast
  * left-anti join ([[graft.fred.ops.DedupSync.newRows]]) against the
  * sheet's (small) key set.
  */
trait SheetSink {
  /** Column shape of the sheet. */
  def schema: StructType
  /** Current sheet contents as a frame (small by construction). */
  def read(spark: SparkSession): DataFrame
  /** Append rows (already deduplicated by the caller). */
  def append(rows: Seq[Row]): Unit
}

object SheetSink {

  /** In-memory fake — the test/sandbox stand-in for a Sheets client. */
  class InMemory(val schema: StructType) extends SheetSink {
    private val buf = scala.collection.mutable.ArrayBuffer.empty[Row]
    def read(spark: SparkSession): DataFrame = {
      val snapshot = synchronized { buf.toList }
      spark.createDataFrame(spark.sparkContext.parallelize(snapshot), schema)
    }
    def append(rows: Seq[Row]): Unit = synchronized { buf ++= rows }
    def size: Int = synchronized { buf.size }
  }

  /** Append-only sync: rows of `incoming` whose `keys` are absent from
    * the sheet are appended; returns the number appended. Idempotent —
    * a second sync of the same frame appends nothing
    * (`load_fred_data_to_google.py:108-131`).
    */
  def syncAppend(incoming: DataFrame, sink: SheetSink,
      keys: Seq[String] = graft.fred.Schemas.servingKey,
      maxAppendRows: Int = 100000): Long = {
    val fresh = graft.fred.ops.DedupSync
      .newRows(incoming, sink.read(incoming.sparkSession), keys)
      .select(sink.schema.fieldNames.map(col).toSeq: _*)
    val rows = fresh.limit(maxAppendRows + 1).collect()
    require(rows.length <= maxAppendRows,
      s"refusing to append > $maxAppendRows rows to a sheet sink — " +
        "a sheet is a bounded serving surface, not a lake")
    sink.append(rows.toIndexedSeq)
    rows.length.toLong
  }
}
