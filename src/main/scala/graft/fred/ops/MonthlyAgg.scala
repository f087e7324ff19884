package graft.fred.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.fred.Schemas

/** A1 — the reference's core relational operator: hash group-by with
  * multi-aggregate, changing grain from daily/weekly observations to
  * monthly (`transform_fred_data.py:124-128`):
  *
  * {{{
  * groupby(['indicator','observation_month','observation_year'])
  *   .agg(value=('value','mean'),
  *        observation_count=('value','count'),
  *        ingested_at=('ingested_at','max'))
  * }}}
  *
  * Null semantics line up exactly: pandas `mean`/`count` skip NaN ⇔
  * Spark `avg`/`count(col)` skip null. Catalyst plans a partial
  * (map-side) + final `HashAggregateExec` around one shuffle on the
  * group keys — at 100 TB the partial agg collapses each partition to
  * ≤ |indicator × month| rows before the exchange, so the shuffle is
  * tiny regardless of input size.
  */
object MonthlyAgg {

  /** Group-agg a cleaned bronze-shaped frame to monthly grain.
    * Expects integer-typed year/month (cast upstream) and double
    * `value`. Adds the `processed_at` job stamp (B3,
    * `transform_fred_data.py:135`) and projects silver column order.
    */
  def toSilver(cleaned: DataFrame): DataFrame =
    aggregate(cleaned)
      .withColumn("processed_at",
        date_format(current_timestamp(), Schemas.IsoMicrosUtc))
      .select(Schemas.silver.fieldNames.map(col).toSeq: _*)

  /** The bare A1 aggregate, without stamps/projection — reusable by
    * queries that group on other keys (e.g. daily grain). */
  def aggregate(df: DataFrame,
      keys: Seq[String] = Seq("indicator", "observation_year", "observation_month")): DataFrame =
    df.groupBy(keys.map(col).toSeq: _*)
      .agg(
        avg("value").as("value"),
        count("value").as("observation_count"),
        max("ingested_at").as("ingested_at"))
}
