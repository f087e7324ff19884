package graft.fred.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Row-cleaning operators of the silver transform.
  *
  * Reference behavior (`transform_fred_data.py:112-121`):
  *   - drop rows whose `value` is null        (B4, `:117`)
  *   - drop FRED's `'.'` missing sentinel     (B5, `:118`)
  *   - lenient numeric cast, bad input → null (C3, `:121`,
  *     `pd.to_numeric(errors='coerce')`)
  *
  * The sentinel filter MUST precede the cast, otherwise revised-missing
  * (`'.'`) and genuinely unparsable values are conflated (SURVEY §7.4.6).
  * `try_cast` gives coerce-to-null semantics regardless of
  * `spark.sql.ansi.enabled` (true by default on Spark 4).
  */
object Clean {

  /** FRED encodes "no observation" as a literal dot. */
  val MissingSentinel = "."

  /** B4: `dropna(subset=cols)`. */
  def dropMissing(df: DataFrame, cols: Seq[String]): DataFrame =
    df.na.drop(cols)

  /** B5: remove sentinel-valued rows (null-safe: nulls are kept here
    * and handled by [[dropMissing]], matching pandas `!=` semantics
    * where NaN rows survive the comparison). */
  def filterSentinel(df: DataFrame, valueCol: String): DataFrame =
    df.filter(col(valueCol).isNull || col(valueCol) =!= MissingSentinel)

  /** C3: lenient string→double cast; unparsable → null. */
  def lenientDouble(c: Column): Column = c.try_cast(DoubleType)

  /** C7: sink-key canonicalization — trim + lowercase
    * (`load_fred_data_to_google.py:100-101`). */
  def canonicalKey(c: Column): Column = lower(trim(c))

  /** The full silver-side cleaning chain on a bronze-shaped frame:
    * sentinel filter → numeric cast → null drop. */
  def cleanValues(df: DataFrame, valueCol: String = "value"): DataFrame = {
    val sentinelFree = filterSentinel(df, valueCol)
    val cast = sentinelFree.withColumn(valueCol, lenientDouble(col(valueCol)))
    dropMissing(cast, Seq(valueCol))
  }
}
