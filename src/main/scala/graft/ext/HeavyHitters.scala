package graft.ext

import org.apache.spark.sql.{DataFrame, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Misra–Gries heavy hitters (Misra & Gries 1982, "Finding repeated
  * elements"; the merge bound is Agarwal et al. PODS'12) — the
  * bounded-memory frequent-items operator next to the repo's other
  * sketches (HLL distinct, GK quantiles): find every key whose
  * frequency exceeds n/(k+1) WITHOUT shuffling the full distinct-key
  * space.
  *
  * Why not plain `groupBy(key).count()`: at 100 TB the distinct-key
  * space (corpus vocabulary, URL set) is itself huge — the exact
  * aggregation shuffles |distinct| rows to find a handful of heavy
  * keys. The two-pass sketch shape caps the shuffle at
  * `numPartitions · k` summary rows:
  *
  *   PASS 1 ([[summarize]]): each partition streams through a k-counter
  *   Misra–Gries summary (`mapPartitions` — genuinely imperative
  *   per-partition state) and emits ≤ k (key, est) rows plus its row
  *   count. Per-partition guarantee: `f_p(x) − n_p/(k+1) ≤ est_p(x) ≤
  *   f_p(x)`; summing summaries keeps it (Σ deficits ≤ n/(k+1)), so
  *   EVERY key with `f(x)·(k+1) > n` survives in some summary — no
  *   false negatives by construction. The summary frame is the one
  *   persist boundary (tiny: ≤ partitions·(k+1) rows).
  *
  *   PASS 2 ([[heavyHitters]]): the candidate keys BROADCAST back over
  *   the corpus (left-semi), exact counts aggregate over candidate
  *   keys only, and the `cnt·(k+1) > n` threshold filters in exact
  *   integer cross-multiplication. The output is therefore EXACT and
  *   deterministic — independent of partitioning and input order, the
  *   property that makes the operator hash-checkable against a plain
  *   GROUP BY/HAVING oracle; the sketch only bounds WHERE the exact
  *   pass looks (the standard production two-pass pattern).
  *
  * Null keys are excluded (a null "heavy hitter" is meaningless and
  * would collide with the summary's partition-total marker rows).
  */
object HeavyHitters {

  /** Per-partition Misra–Gries summaries over `keyCol` (nulls
    * dropped): ≤ k counter rows `(key, est, 0)` per partition plus one
    * partition-total row `(null, 0, n_p)`. Decrement-all on overflow
    * amortizes O(1) per input row (each decrement cancels one prior
    * increment). */
  def summarize(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val keyType = df.schema(keyCol).dataType
    val outSchema = StructType(Seq(
      StructField("key", keyType, nullable = true),
      StructField("est", LongType, nullable = false),
      StructField("np", LongType, nullable = false)))
    df.select(col(keyCol)).where(col(keyCol).isNotNull)
      .mapPartitions { rows =>
        val m = new scala.collection.mutable.HashMap[Any, Long]()
        var n = 0L
        rows.foreach { r =>
          val key = r.get(0)
          n += 1
          m.get(key) match {
            case Some(c) => m.update(key, c + 1)
            case None =>
              if (m.size < k) m.update(key, 1L)
              else {
                val ks = m.keysIterator.toArray
                var i = 0
                while (i < ks.length) {
                  val nv = m(ks(i)) - 1
                  if (nv == 0L) m.remove(ks(i)) else m.update(ks(i), nv)
                  i += 1
                }
              }
          }
        }
        m.iterator.map { case (key, est) =>
          org.apache.spark.sql.Row(key, est, 0L) } ++
          Iterator.single(org.apache.spark.sql.Row(null, 0L, n))
      }(Encoders.row(outSchema))
  }

  /** Merge two summary frames and prune back to ≤ k counters — the
    * Agarwal et al. (PODS'12) MG merge: sum matching counters,
    * subtract the (k+1)-th largest merged count from every counter,
    * drop the non-positive. The deficit bound degrades gracefully to
    * `(n_a + n_b)/(k+1)` — the associativity that makes the sketch a
    * STREAMING running state (see [[updateSavedSummary]]) and not just
    * a per-partition trick. Only the pivot count crosses to the driver
    * (a k+1-row `limit` collect); ties at the pivot break (est DESC,
    * key ASC). */
  def mergeSummaries(a: DataFrame, b: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val u = a.unionByName(b)
    val n = u.where(col("key").isNull)
      .agg(coalesce(sum("np"), lit(0L))).head().getLong(0)
    val counters = u.where(col("key").isNotNull)
      .groupBy("key").agg(sum("est").as("est"))
    val top = counters.orderBy(col("est").desc, col("key").asc)
      .limit(k + 1).collect()
    val d = if (top.length <= k) 0L else top.last.getLong(1)
    val pruned = counters.where(col("est") > d)
      .select(col("key"), (col("est") - d).as("est"), lit(0L).as("np"))
    val total = u.sparkSession.createDataFrame(
      java.util.Collections.singletonList(
        org.apache.spark.sql.Row(null, 0L, n)),
      org.apache.spark.sql.types.StructType(u.schema.fields))
    pruned.unionByName(total)
  }

  /** Running Misra–Gries summary maintained under a lake path across
    * micro-batches (the [[Ivf.appendToSaved]] posture for sketches):
    * each batch summarizes distributedly, merges into the saved
    * summary, and the ≤ k+1-row result replaces the path via the
    * crash-safe [[SketchState.swapInState]] swap (materialized on the
    * driver FIRST — a frame this small never read-overwrite races).
    * After any number of batches the saved candidates still contain
    * every key with `f·(k+1) > n` over the WHOLE stream; an exact
    * [[heavyHitters]]-style count pass over the accumulated lake turns
    * them into the exact answer on demand.
    *
    * The MG merge is additive in `n` (NOT idempotent), so replaying a
    * micro-batch after a failure inflates the stream count — callers
    * with replayable sources pass the foreachBatch `batchId` and a
    * batch with id ≤ the persisted marker is skipped
    * ([[SketchState.updateSavedCms]]'s exactly-once guard). */
  def updateSavedSummary(root: String, batch: DataFrame, keyCol: String,
      k: Int, batchId: Option[Long] = None): Unit = {
    val spark = batch.sparkSession
    val last = SketchState.lastAppliedBatchId(spark, root)
    if (SketchState.isReplayedBatch(last, batchId, root,
        SketchState.failOnLag(spark))) return
    val bs = summarize(batch, keyCol, k)
    val path = new org.apache.hadoop.fs.Path(root)
    val fs = path.getFileSystem(spark.sessionState.newHadoopConf())
    val merged =
      if (fs.exists(path)) mergeSummaries(spark.read.parquet(root), bs, k)
      else mergeSummaries(bs, bs.limit(0), k)
    SketchState.replaceState(spark, root, merged, batchId.orElse(last))
  }

  /** Exact heavy hitters via the two-pass sketch: every key with
    * `count·(k+1) > n` over non-null rows, as (keyCol, cnt, share)
    * with share at 4 dp (cnt·10000.0/n then the shared round — one
    * mirrored IEEE division over exact integers). Output is exact and
    * partitioning-independent; see the object scaladoc for why the
    * candidate pass exists. */
  def heavyHitters(df: DataFrame, keyCol: String, k: Int): DataFrame = {
    val parts = summarize(df, keyCol, k).persist()
    val n = parts.where(col("key").isNull)
      .agg(coalesce(sum("np"), lit(0L))).head().getLong(0)
    // localCheckpoint (eager) pins the ≤ partitions·(k+1)-row candidate
    // set and cuts its lineage back to `parts`, so the summary cache
    // can be released immediately — repeated invocations (the fuzz
    // battery runs this per seed) no longer accumulate cached blocks
    // for the life of the session (r13 ADVICE #4).
    val cand = parts.where(col("key").isNotNull)
      .select(col("key").as(keyCol)).distinct().localCheckpoint()
    parts.unpersist()
    df.where(col(keyCol).isNotNull)
      .join(broadcast(cand), Seq(keyCol), "left_semi")
      .groupBy(keyCol).agg(count(lit(1)).as("cnt"))
      .where(col("cnt") * (k + 1) > n)
      .select(col(keyCol), col("cnt"),
        (round(col("cnt") * 10000.0 / n) / 1e4).as("share"))
  }
}
