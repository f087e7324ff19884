package graft.fred.io

import org.apache.spark.sql.{DataFrame, SparkSession}

/** G4 — JDBC source reads.
  *
  * The reference reads its serving table with one cursor on the driver
  * (`load_fred_data.py:68-81`). Spark's JDBC source is the passthrough
  * equivalent; these wrappers pin the two shapes that matter and give
  * them a testable surface:
  *
  *  - [[read]]: single-partition read of a table (or pushed-down
  *    query) — right for small serving tables, exactly the reference's
  *    use.
  *  - [[readPartitioned]]: `numPartitions` concurrent connections each
  *    scanning one `partitionColumn` stripe — the only shape that
  *    survives a large table, since a single JDBC cursor is a
  *    driver-side bottleneck no cluster size fixes. Stripe bounds are
  *    `[lowerBound, upperBound]` split evenly; rows outside still land
  *    in the edge stripes (Spark semantics), so coverage is total.
  */
object JdbcRead {

  /** Single-cursor read of `table` (a table name or a
    * `(SELECT …) alias` pushdown subquery). */
  def read(spark: SparkSession, url: String, table: String,
      driver: Option[String] = None): DataFrame = {
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
    driver.fold(r)(d => r.option("driver", d)).load()
  }

  /** Parallel striped read on a numeric/date `partitionColumn`. */
  def readPartitioned(spark: SparkSession, url: String, table: String,
      partitionColumn: String, lowerBound: Long, upperBound: Long,
      numPartitions: Int, fetchSize: Int = 1000,
      driver: Option[String] = None): DataFrame = {
    require(numPartitions > 0, "numPartitions must be positive")
    require(lowerBound < upperBound, "need lowerBound < upperBound")
    val r = spark.read.format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("partitionColumn", partitionColumn)
      .option("lowerBound", lowerBound)
      .option("upperBound", upperBound)
      .option("numPartitions", numPartitions)
      .option("fetchsize", fetchSize)
    driver.fold(r)(d => r.option("driver", d)).load()
  }
}
