package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver testdata tables (TESTDATA.md).
  *
  * All queries read through here so scan-level concerns (nanosecond
  * timestamps, pushdown-friendly projection) are handled once.
  */
object Tables {

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(path(dir, name))

  def lineitem(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame = load(spark, dir, "supplier")
  def nation(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame   = load(spark, dir, "region")
  def part(spark: SparkSession, dir: String): DataFrame     = load(spark, dir, "part")
  /** documents/embeddings feed per-row EXPANSION pipelines (tokenize,
    * gram explode, vector math) in nearly every consumer, and the
    * driver testdata ships each as ONE single-row-group parquet file —
    * an unsplittable scan that ran every such pipeline's head on one
    * task (r20 optimization, guide §2.5 "input skew"). The conditional
    * spread hash-repartitions to the cluster parallelism only when the
    * scan plans fewer partitions; a production-scale table with
    * thousands of splits passes through untouched, so the plan stays
    * scale-adaptive rather than tuned to the local regime. The
    * row-sized tables (lineitem/orders/events) are deliberately NOT
    * spread: their consumers aggregate at the scan, and repartitioning
    * raw rows ahead of a map-side partial aggregation would shuffle
    * strictly more bytes than it saves. */
  def documents(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextOps.spreadNarrow(load(spark, dir, "documents"), "doc_id")
  def embeddings(spark: SparkSession, dir: String): DataFrame =
    graft.ext.TextOps.spreadNarrow(load(spark, dir, "embeddings"), "vec_id")

  /** `events.ts` has shipped in two physical forms across driver
    * testdata generations: INT64 TIMESTAMP(NANOS) — which Spark's
    * microsecond `TimestampType` cannot hold natively, so it is read
    * as a raw long (`nanosAsLong`) and truncated to micros — and
    * plain TIMESTAMP(MICROS) without UTC adjustment, which Spark
    * reads as `TimestampNTZType`. Both normalize to the SAME
    * session-zoned `TimestampType` micros here (the session time zone
    * is pinned UTC in [[GraftSession]], so the NTZ→LTZ cast is an
    * exact epoch mapping, not a wall-clock shift). Branching on the
    * scanned schema keeps every consumer — and the DuckDB oracle,
    * which reads the same file as a naive timestamp — agreeing on the
    * values regardless of which generation wrote the file.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = load(spark, dir, "events")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        // integral `div`, not `/`: float division of epoch nanos
        // (~1.7e18) sits beyond double's 2^53 mantissa and corrupts
        // the last microsecond digit
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      case _ => raw // already session-zoned TimestampType
    }
  }
}
