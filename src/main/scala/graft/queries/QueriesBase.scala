package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** Shared plumbing for the per-family query traits that assemble into
  * [[Queries]]: the catalog entry type and the determinism helpers
  * every family leans on (see the [[Queries]] scaladoc for the rules).
  */
trait QueriesBase {

  type Q = (SparkSession, String) => DataFrame

  /** The ONE production split configuration, shared by `split_assign`
    * and the `split_leakage` audit (r9 ADVICE): if the weights or salt
    * ever change, both the assignment and the audit move together —
    * a leakage audit of a different split than production is silently
    * worthless. The oracle SQL mirrors these literals (bucket < 80 /
    * < 90, salt 'graft'). */
  protected val SplitWeights = Seq("train" -> 80, "val" -> 10, "test" -> 10)
  protected val SplitSalt = "graft"

  /** Exact micro-scaled sum: values are ≤2-dp doubles in the testdata,
    * so `round(v*1e6)` is an exact integer and the BIGINT sum is
    * order-independent — the only way a sum of doubles hashes
    * identically between Spark and the DuckDB oracle. */
  protected def sumE6(c: org.apache.spark.sql.Column) =
    sum(round(c * 1e6).cast("long"))

  /** Exact average as double: integer sum then two IEEE-754 divisions,
    * each correctly rounded, hence bit-identical across engines (a
    * plain `round(avg(x), 4)` lands on `.xxxx5` boundaries constantly
    * with 2-dp inputs and flips the last digit per summation order). */
  protected def exactAvg(c: org.apache.spark.sql.Column) =
    sumE6(c).cast("double") / count(c) / 1e6

  /** The FRED silver analog at daily grain: events is a daily-ish
    * observation stream; group to (indicator=event_type, y, m, d). */
  protected def dailySilver(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(
        col("event_type").as("indicator"),
        year(col("ts")).as("observation_year"),
        month(col("ts")).as("observation_month"),
        dayofmonth(col("ts")).as("observation_day"),
        col("value"))
      .groupBy("indicator", "observation_year", "observation_month", "observation_day")
      .agg(exactAvg(col("value")).as("value"),
        count(col("value")).as("observation_count"))

  /** Same, only the series columns (for window/as-of queries). */
  protected def dailySeries(s: SparkSession, dir: String): DataFrame =
    dailySilver(s, dir).select("indicator", "observation_day", "value")
}
