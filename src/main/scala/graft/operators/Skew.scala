package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for hot keys at 100 TB.
  *
  * AQE's skew-join split (`spark.sql.adaptive.skewJoin`) handles most
  * skew at runtime; these are the explicit forms for the cases AQE
  * can't fix: a single group-by key carrying a disproportionate share
  * of rows (partial aggregation already bounds that unless the
  * aggregate is holistic), and a shuffle join where one key floods a
  * task.
  *
  * Salts are deterministic (hash of a spread column, or a per-row
  * id modulo), never `rand()` — retried tasks must re-derive identical
  * salts or shuffle-file reuse breaks exactly-once semantics.
  */
object Skew {

  /** Two-stage salted aggregation: stage 1 aggregates on
    * (keys, salt) — splitting each hot key across `salts` reducers —
    * stage 2 merges the partials. Caller supplies partial and merge
    * aggregate lists; correct for any decomposable (algebraic)
    * aggregate: sum/count/min/max, and avg via (sum, count).
    *
    * @param spread a column whose hash spreads a key's rows ~uniformly
    *               (e.g. a row id); salted as `pmod(hash(spread), salts)`
    */
  def saltedAgg(df: DataFrame, keys: Seq[String], spread: Column, salts: Int,
      partial: Seq[Column], merge: Seq[Column]): DataFrame = {
    require(salts > 1, "need at least 2 salts")
    val staged = df.withColumn("__salt", pmod(hash(spread), lit(salts)))
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partial.head, partial.tail: _*)
    staged.groupBy(keys.map(col): _*)
      .agg(merge.head, merge.tail: _*)
  }

  /** Salted mean over `valueCol` per `keys` — the A1 hot-key form:
    * emits (value, observation_count) like MonthlyAgg, computed as
    * merged (sum, count) partials so the result is independent of the
    * salt split. */
  def saltedMeanCount(df: DataFrame, keys: Seq[String], spread: Column,
      salts: Int, valueCol: String = "value"): DataFrame =
    saltedAgg(df, keys, spread, salts,
      partial = Seq(
        sum(valueCol).as("__sum"),
        count(valueCol).as("__cnt")),
      merge = Seq(
        (sum("__sum") / sum("__cnt")).as("value"),
        sum("__cnt").as("observation_count")))

  /** Salted shuffle join for a skewed LEFT side against a moderate
    * right side that is too big to broadcast outright: left rows get a
    * deterministic salt in [0, salts); the right side is replicated
    * `salts` times; the join key becomes (key, salt). Each hot left
    * key now spreads over `salts` tasks at the cost of `salts`× right
    * shuffle volume — the classic trade, worth it when
    * |right| × salts ≪ |left hot partition|.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      spread: Column, salts: Int, joinType: String = "inner"): DataFrame = {
    require(salts > 1, "need at least 2 salts")
    // right/full joins are unsupported: the right side is replicated
    // `salts` times, so an unmatched right row would be emitted once
    // per salt — silently wrong results, not a performance question.
    val normalized = joinType.toLowerCase.replace("_", "")
    require(Set("inner", "left", "leftouter", "leftsemi", "leftanti",
        "semi", "anti")(normalized),
      s"saltedJoin supports left-preserving join types only, got '$joinType' " +
        "(unmatched right rows would be duplicated once per salt)")
    val l = left.withColumn("__salt", pmod(hash(spread), lit(salts)))
    val r = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    l.join(r, keys :+ "__salt", joinType).drop("__salt")
  }
}
