package graft.fred.io

import java.sql.{Connection, DriverManager}
import org.apache.spark.sql.{DataFrame, Row}

/** H3/D2 — JDBC keyed-upsert sink.
  *
  * The reference loads each gold year with one multi-row
  * `INSERT … ON CONFLICT (indicator, observation_year, observation_month)
  * DO UPDATE SET <col> = EXCLUDED.<col>` statement in a single
  * transaction (`load_fred_data.py:49-66`). Spark has no DataFrame-level
  * upsert, so this is connector code: `foreachPartition`, one connection
  * and one transaction per partition, batched statements.
  *
  * Transactionality is therefore per-partition, not per-year — an
  * intentional, documented divergence (SURVEY §7.4.7); callers that need
  * the reference's single-transaction behavior `coalesce(1)` first.
  * Each row's upsert is idempotent, so partition-level retries are safe.
  */
object UpsertSink {

  /** Build the PostgreSQL upsert statement for one row (parameterized).
    * Mirrors `load_fred_data.py:54-59`. */
  def upsertSql(table: String, columns: Seq[String], keys: Seq[String]): String = {
    require(keys.forall(columns.contains), "keys must be a subset of columns")
    val updatable = columns.filterNot(keys.contains)
    val sets = updatable.map(c => s"$c = EXCLUDED.$c").mkString(", ")
    s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")}) " +
      s"ON CONFLICT (${keys.mkString(", ")}) DO UPDATE SET $sets"
  }

  /** Plain-INSERT statement builder — for appends to fresh tables and
    * for engines without `ON CONFLICT` (the embedded-Derby test rig). */
  def insertSql(table: String, columns: Seq[String], keys: Seq[String]): String =
    s"INSERT INTO $table (${columns.mkString(", ")}) " +
      s"VALUES (${columns.map(_ => "?").mkString(", ")})"

  /** Write `df` to `table` via upsert. `batchSize` bounds statement
    * batches; executors each open one connection. `sqlBuilder` swaps
    * the per-row statement dialect (default: Postgres `ON CONFLICT`
    * like the reference); the partition/batch/transaction machinery is
    * dialect-independent. */
  def write(df: DataFrame, url: String, table: String,
      keys: Seq[String] = graft.fred.Schemas.servingKey,
      props: java.util.Properties = new java.util.Properties(),
      batchSize: Int = 500,
      sqlBuilder: (String, Seq[String], Seq[String]) => String = upsertSql): Unit = {
    val columns = df.columns.toSeq
    val sql = sqlBuilder(table, columns, keys)
    df.foreachPartition { rows: Iterator[Row] =>
      if (rows.nonEmpty) {
        val conn: Connection = DriverManager.getConnection(url, props)
        try {
          conn.setAutoCommit(false)
          val stmt = conn.prepareStatement(sql)
          var n = 0
          rows.foreach { row =>
            columns.indices.foreach { i => stmt.setObject(i + 1, row.get(i)) }
            stmt.addBatch()
            n += 1
            if (n % batchSize == 0) stmt.executeBatch()
          }
          stmt.executeBatch()
          conn.commit()
        } catch {
          case e: Throwable => conn.rollback(); throw e
        } finally conn.close()
      }
    }
  }
}
