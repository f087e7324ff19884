package graft.fred.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.fred.Schemas

/** Gold-layer operators.
  *
  * The reference's yearly "aggregation" (`aggregate_fred_data.py:103-124`)
  * does NOT re-aggregate: it unions the ≤12 monthly silver frames for a
  * year (E1, `:113`), stamps `aggregated_at` (B3, `:121`), and rounds
  * `value` to 2 decimals (C6, `:122`). Row grain stays monthly.
  *
  * C6 is pandas/numpy `round`, i.e. HALF_EVEN (banker's) — Spark
  * `bround`, NOT `round` (HALF_UP). Oracle-visible difference
  * (SURVEY §7.4.1).
  *
  * Tie caveat (fuzz-caught): every engine resolves a double that
  * PRINTS as "…5" differently — Spark `bround` rounds the shortest
  * DECIMAL repr (66195.225 → .22), numpy/DuckDB round by the BINARY
  * value's true side of the half-way point (66195.225 binary is just
  * above → .23), and neither is replayable in the other. [[toGold]]
  * keeps `bround` for reference-API parity (ties are measure-zero
  * noise either way); the hash-gated catalog query instead applies
  * HALF_EVEN to the exact RATIONAL mean (micro-sum / count) in pure
  * integer arithmetic — deterministic and engine-portable at every
  * value including exact ties (see `CoreQueries.fredYearlyGold`). */
object YearlyGold {

  /** E1: union monthly frames by name. In the lake-backed pipeline this
    * is normally obviated by reading the partitioned silver root with a
    * year filter (one scan, partition-pruned) — kept for parity with
    * callers that assemble frames incrementally. */
  def unionMonths(months: Seq[DataFrame]): DataFrame =
    months.reduce(_.unionByName(_))

  /** C6+B3: round value HALF_EVEN(2) and stamp. */
  def toGold(silverYear: DataFrame): DataFrame =
    silverYear
      .withColumn("value", bround(col("value"), 2))
      .withColumn("aggregated_at",
        date_format(current_timestamp(), Schemas.IsoMicrosUtc))
      .select(Schemas.gold.fieldNames.map(col).toSeq: _*)
}
