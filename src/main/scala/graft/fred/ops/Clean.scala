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

  /** The reference's OTHER lenient-cast flavor, on the serving path
    * (`load_fred_data_to_google.py:97-98`, pandas
    * `to_numeric(errors='ignore')`): ALL-OR-NOTHING per column. The
    * column becomes numeric only when every non-null value parses; a
    * single bad value keeps the whole column as its original strings
    * (pandas returns the input unchanged on any error — it never
    * mixes). Contrast [[lenientDouble]] (`errors='coerce'`), which
    * nulls just the bad values. Column-level by nature, so the frame
    * is evaluated twice (the any-bad probe — short-circuiting when a
    * bad value exists, a full scan when the column is clean — then the
    * returned frame); it is materialized first so a non-deterministic
    * source cannot change between the two and produce the mixed
    * null/value column the all-or-nothing contract excludes. The
    * serving path this twins is bounded by construction (it feeds a
    * sheet), so the checkpoint is cheap. */
  def lenientKeepString(df: DataFrame, valueCol: String): DataFrame = {
    val snap = df.localCheckpoint()
    val anyBad = !snap.filter(col(valueCol).isNotNull &&
      lenientDouble(col(valueCol)).isNull).isEmpty
    if (anyBad) snap
    else snap.withColumn(valueCol, lenientDouble(col(valueCol)))
  }

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

  /** The keep-the-row alternative to [[cleanValues]]' drop: fill null
    * values with the per-group exact mean of the PRESENT values —
    * mean imputation, the standard feature-hygiene step when rows are
    * too precious to drop. The mean is the micro-scaled integer sum
    * over non-null rows (order-free, oracle-exact; nulls skipped by
    * sum/count in every engine); the fill frame is |groups| rows, so
    * the join broadcasts under AQE and the data side never shuffles.
    * Emits `<valueCol>_filled` plus a `was_imputed` flag; groups with
    * NO present value keep null (nothing to impute from). */
  def imputeGroupMean(df: DataFrame, groupCols: Seq[String],
      valueCol: String): DataFrame = {
    val means = df
      .groupBy(groupCols.map(col): _*)
      .agg((sum(round(col(valueCol) * 1e6).cast("long")).cast("double")
        / count(col(valueCol)) / 1e6).as("__mean"))
    df.join(means, groupCols) // no hint: AQE decides
      .withColumn(valueCol + "_filled",
        coalesce(col(valueCol), col("__mean")))
      .withColumn("was_imputed",
        (col(valueCol).isNull && col("__mean").isNotNull).cast("int"))
      .drop("__mean")
  }
}
