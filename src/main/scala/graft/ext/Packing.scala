package graft.ext

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing: assign documents to consecutive fixed token-budget
  * packs (context windows) ahead of training-example assembly.
  *
  * Exact first-fit bin packing is prefix-sequential — each placement
  * depends on every previous one — so it cannot be a window function
  * and does not scale past one partition. The standard distributed
  * approximation used here: within each group, order documents
  * deterministically, take the running token total, and start a new
  * pack each time the running total crosses the budget
  * (`pack_id = floor(preceding_total / budget)`). Packs can overflow by
  * at most one document; no document is split.
  *
  * Scale shape: one window per GROUP, so `groupCols` must be a sharding
  * key with bounded group size (source × date × shard in a real lake) —
  * then the sort is per-group and the whole operator is one shuffle.
  * An empty `groupCols` would mean one global window — a
  * single-partition sort bottleneck at scale — so [[packByBudget]]
  * rejects it outright; shard first (or pack per source/date) instead.
  */
object Packing {

  /** Power-of-two SEQUENCE-LENGTH BUCKETING — the dynamic-batching
    * prep: pad-to-bucket batching wastes `bucket − n_tokens` pad
    * tokens per doc, so assigning each doc to the smallest power-of-2
    * bucket ≥ its token count (floored at `minBucket`) and reading the
    * per-bucket fill ratio IS the padding-cost audit that decides the
    * bucket boundaries of a training run. One scan + one
    * map-side-combinable aggregate.
    *
    * The bucket computes in exact BIT arithmetic — binary-string
    * length, `2^⌈log2 n⌉ = 1 << bits(n−1)` — never libm `log2`, whose
    * float seam at exact powers of two would bounce a 1024-token doc
    * into the 2048 bucket on one engine and not the other (the
    * portable-HLL rank discipline; DuckDB `bin` ≡ Spark `conv(_,10,2)`,
    * no leading zeros). Output: (bucket, n_docs, n_tokens, capacity,
    * padding_waste, fill_ratio) — all exact BIGINTs plus one mirrored
    * 4-dp division.
    *
    * A NULL token count coalesces to 0 (→ the minBucket row) so the
    * doc is counted consistently on BOTH axes — before r16 it fell to
    * minBucket via greatest's null-skipping but its null weight was
    * skipped by sum, silently skewing that row's padding_waste and
    * fill_ratio (r15 ADVICE #4). */
  def lengthBuckets(df: DataFrame, tokens: Column,
      minBucket: Int = 16): DataFrame = {
    require(minBucket >= 1 && Integer.bitCount(minBucket) == 1,
      "minBucket must be a positive power of two")
    val n = coalesce(tokens.cast("long"), lit(0L))
    // shiftleft's bit count must be a column here -> SQL expr form
    val pow2 = when(col("__n") <= 1L, lit(1L))
      .otherwise(expr("shiftleft(1L, cast(length(conv(__n - 1, 10, 2)) as int))"))
    df.select(n.as("__n"))
      .select(col("__n"),
        greatest(lit(minBucket.toLong), pow2).as("bucket"))
      .groupBy("bucket")
      .agg(count(lit(1)).as("n_docs"), sum(col("__n")).as("n_tokens"))
      .select(col("bucket"), col("n_docs"), col("n_tokens"),
        (col("bucket") * col("n_docs")).as("capacity"),
        (col("bucket") * col("n_docs") - col("n_tokens"))
          .as("padding_waste"),
        (round(col("n_tokens") * 10000.0 /
          (col("bucket") * col("n_docs"))) / 1e4).as("fill_ratio"))
  }


  /** Add (`n_tokens`, `pack_id`) within each group. `orderCols` must be
    * a deterministic total order (include a unique id). */
  def packByBudget(df: DataFrame, groupCols: Seq[String], orderCols: Seq[String],
      tokens: Column, budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(groupCols.nonEmpty,
      "groupCols must be non-empty (a global pack order is a single-partition " +
        "sort; shard first, or pack per source/date)")
    require(orderCols.nonEmpty, "need a deterministic order within groups")
    // explicit ROWS frame: Spark's default with an ORDER BY is RANGE,
    // which merges tied order keys into one cumsum step and would break
    // the floor(preceding/budget) law (and the oracle's ROWS frame)
    // whenever orderCols aren't unique
    val w = Window.partitionBy(groupCols.map(col): _*)
      .orderBy(orderCols.map(col): _*)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    df.withColumn("n_tokens", tokens.cast("long"))
      .withColumn("pack_id",
        floor((sum(col("n_tokens")).over(w) - col("n_tokens"))
          / lit(budget.toDouble)).cast("long"))
  }

  /** Per-pack summary: document count and token fill. */
  def packStats(packed: DataFrame, groupCols: Seq[String]): DataFrame =
    packed.groupBy((groupCols.map(col) :+ col("pack_id")): _*)
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("pack_tokens"))

  /** Packing-efficiency report per group: pack count, token fill vs
    * capacity (n_packs · budget), overflow packs (the ≤-one-doc
    * overshoot the running-total law allows), and the fill extremes.
    * The number a training-infra team actually watches — utilization
    * below ~90% means the padding budget is buying nothing — and the
    * MEASUREMENT that decides ordering policy: under [[packByBudget]]'s
    * next-fit semantics, tokens-desc ordering (NFD) is NOT
    * automatically tighter than arrival order (first-fit-decreasing's
    * guarantee does not transfer to next-fit; on the driver corpus
    * arrival order in fact wins, 88.3% vs 87.0%) — which is exactly
    * why the report exists: measure, don't assume. One bounded agg
    * over [[packStats]]. */
  def utilizationReport(packed: DataFrame, groupCols: Seq[String],
      budget: Int): DataFrame = {
    require(budget > 0, "budget must be positive")
    packStats(packed, groupCols)
      .groupBy(groupCols.map(col): _*)
      .agg(
        count(lit(1)).as("n_packs"),
        sum("pack_tokens").as("total_tokens"),
        sum(when(col("pack_tokens") > budget, 1L).otherwise(0L))
          .as("n_overflow"),
        min("pack_tokens").as("min_fill"),
        max("pack_tokens").as("max_fill"))
      .withColumn("capacity", col("n_packs") * lit(budget.toLong))
      // integer-scaled rounding — see TextOps.qualitySignals
      .withColumn("util_ratio",
        round(col("total_tokens") * lit(10000.0) / col("capacity")) / 1e4)
  }

  /** Assemble each pack's training text: member documents joined by
    * `sep` in `orderCol` order. `collect_list` gives no ordering
    * guarantee under distributed execution, so the collected
    * (order, text) structs are `array_sort`ed before joining — the
    * assembled string is deterministic on any cluster. One pack is one
    * training example, so the per-pack collect is budget-bounded by
    * construction. */
  def packTexts(packed: DataFrame, groupCols: Seq[String], orderCol: String,
      textCol: String, sep: String = "\n\n"): DataFrame =
    packed.groupBy((groupCols.map(col) :+ col("pack_id")): _*)
      .agg(collect_list(struct(col(orderCol), col(textCol))).as("__members"))
      .withColumn("pack_text",
        concat_ws(sep,
          transform(array_sort(col("__members")), m => m.getField(textCol))))
      .withColumn("n_docs", size(col("__members")).cast("long"))
      .drop("__members")
}
