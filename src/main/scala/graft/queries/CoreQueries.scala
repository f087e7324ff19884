package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.fred.ops.{Clean, DedupSync, Merge, MonthlyAgg, YearlyGold}
import graft.ext.{Decontam, Dedup, Ivf, MultiModal, Packing, Profile, Sampling, SemDedup, SeriesOps, Similarity, Splits, TextOps, VectorLsh, VectorQuant, VectorStats}

/** The reference surface: FRED bronze→silver→gold, merges, scalar dates. */
trait CoreQueries extends QueriesBase {

  // ======================================================== [REF] core

  /** A1 — the reference's group-agg (daily→monthly grain change). */
  val fredMonthlyAgg: Q = (s, dir) =>
    Tables.events(s, dir)
      .select(
        col("event_type").as("indicator"),
        year(col("ts")).as("observation_year"),
        month(col("ts")).as("observation_month"),
        col("value"))
      .groupBy("indicator", "observation_year", "observation_month")
      .agg(exactAvg(col("value")).as("value"),
        count(col("value")).as("observation_count"))

  /** A1 at daily grain (the richer silver layer). */
  val fredDailyAgg: Q = (s, dir) => dailySilver(s, dir)

  /** B4+B5+C3 — sentinel filter, lenient cast, null drop (on a JSON-
    * extracted string column, also covering the C-ext json path). */
  val fredCleanCast: Q = (s, dir) => {
    val withVal = Tables.events(s, dir)
      .withColumn("value", get_json_object(col("props"), "$.k"))
    Clean.cleanValues(withVal)
      .groupBy("event_type")
      .agg((sumE6(col("value")).cast("double") / 1e6).as("k_sum"),
        count(col("value")).as("k_count"))
  }

  /** E1+C6 — union monthly halves, HALF_EVEN round to 2 (gold layer).
    *
    * The rounding is EXACT-integer HALF_EVEN of the rational mean
    * S/(c·10⁶), not engine `bround`/`round_even` of the double:
    * engines resolve printed "…5" ties by different rules (Spark by
    * shortest decimal repr, numpy/DuckDB by the binary value's true
    * side — fuzz-caught at 66195.225 and 40.825), so the only
    * portable definition is the tie logic on the exact integers. The
    * micro-sum S reconstructs exactly for |S| ≲ 2⁵⁰: the round trip
    * S → S/(c·10⁶) → ·c·10⁶ → round passes through THREE correctly-
    * rounded double operations, each contributing ≤ ½ ulp, so
    * reconstruction is only guaranteed while 3 half-ulps stay below
    * ½ absolute — about three bits short of the 2⁵³ mantissa
    * (testdata magnitudes sit near 2⁴⁹). Beyond that, carry the
    * BIGINT micro-sum out of the silver aggregate instead of
    * reconstructing it from the double mean. */
  val fredYearlyGold: Q = (s, dir) => {
    val silver = dailySilver(s, dir)
    val first = silver.filter(col("observation_day") <= 15)
    val second = silver.filter(col("observation_day") > 15)
    YearlyGold.unionMonths(Seq(first, second))
      .withColumn("__S",
        round(col("value") * col("observation_count") * 1e6).cast("long"))
      .withColumn("__D", col("observation_count").cast("long") * lit(10000L))
      .withColumn("__r", pmod(col("__S"), col("__D")))
      .withColumn("__q",
        ((col("__S") - col("__r")) / col("__D")).cast("long"))
      .withColumn("value",
        (col("__q") + when(col("__r") * 2 > col("__D"), 1L)
          .when(col("__r") * 2 < col("__D"), 0L)
          .otherwise(pmod(col("__q"), lit(2L)))).cast("double") / 100)
      .drop("__S", "__D", "__r", "__q")
  }

  /** D1 — dedup-against-sink left anti join. */
  val fredDedupSync: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
    val incoming = ev.select("user_id", "event_type").distinct()
    val existing = ev.filter(col("event_id") % 7 === 0)
    DedupSync.newRows(incoming, existing, Seq("user_id", "event_type"))
  }

  /** D2 — keyed upsert: late batch (day>20) overrides base on the
    * natural key; recency = event_id (monotone). */
  val fredUpsertMerge: Q = (s, dir) => {
    val ev = Tables.events(s, dir)
      .select(col("user_id"), col("event_type"), col("event_id"), col("value"),
        dayofmonth(col("ts")).as("d"))
    val base = ev.filter(col("d") <= 20).drop("d")
    val delta = ev.filter(col("d") > 20).drop("d")
    Merge.upsert(base, delta, Seq("user_id", "event_type"), Seq(col("event_id").desc))
  }

  /** D2-ext — SCD-type-2 history: every (user, event_type) version
    * with its validity interval instead of last-write-wins. Times as
    * epoch micros so the compare is representation-free. */
  val mergeScd2: Q = (s, dir) =>
    Merge.scd2History(
        Tables.events(s, dir)
          .select(col("user_id"), col("event_type"), col("event_id"),
            col("value"), unix_micros(col("ts")).as("ts_us")),
        Seq("user_id", "event_type"), "ts_us",
        Seq(col("ts_us").asc, col("event_id").asc))
      .select("user_id", "event_type", "event_id", "value",
        "valid_from", "valid_to", "version")

  /** C1/C2/C7 — date parsing/parts and string normalization. */
  val scalarDates: Q = (s, dir) =>
    Tables.orders(s, dir).select(
      col("o_orderkey"),
      date_format(col("o_orderdate"), "yyyy-MM-dd").as("order_date"),
      year(col("o_orderdate")).as("order_year"),
      quarter(col("o_orderdate")).as("order_quarter"),
      month(col("o_orderdate")).as("order_month"),
      lower(trim(col("o_orderpriority"))).as("priority_key"))


  /** This family's slice of [[Queries.all]]. */
  protected def coreRegistry: Map[String, Q] = Map(
    "fred_monthly_agg" -> fredMonthlyAgg,
    "fred_daily_agg" -> fredDailyAgg,
    "fred_clean_cast" -> fredCleanCast,
    "fred_yearly_gold" -> fredYearlyGold,
    "fred_dedup_sync" -> fredDedupSync,
    "fred_upsert_merge" -> fredUpsertMerge,
    "merge_scd2" -> mergeScd2,
    "scalar_dates" -> scalarDates)
}
