package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Event-time streaming analytics over an `events`-shaped stream
  * (`event_id, ts, user_id, event_type, value`): watermarked tumbling
  * windows, session windows, and custom running state via
  * `flatMapGroupsWithState` (SURVEY §2.J `[EXT]`).
  *
  * Watermarks bound state: with a `delay` watermark, window state older
  * than (max event time − delay) is evicted, so state size is
  * O(active windows × keys), independent of stream length — the
  * property that keeps these queries alive on an unbounded 100 TB/day
  * firehose.
  */
object EventStreams {

  /** Tumbling event-time window counts/sums per event type, late data
    * admitted up to `delay`. Calendar months don't tile into fixed
    * windows (SURVEY §2.J) — for month grain use [[StreamingSilver]];
    * this is the sub-day analytics path. */
  def tumblingAgg(events: DataFrame, window_ : String = "1 hour",
      delay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        sum("value").as("value_sum"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"),
        col("event_type"), col("n_events"), col("value_sum"))

  /** Session windows per user: events within `gap` of each other fuse
    * into one session (state-store merging session aggregation). */
  def sessionAgg(events: DataFrame, gap: String = "30 minutes",
      delay: String = "1 day"): DataFrame =
    events
      .withWatermark("ts", delay)
      .groupBy(session_window(col("ts"), gap), col("user_id"))
      .agg(count(lit(1)).as("n_events"), sum("value").as("value_sum"))
      .select(col("session_window.start").as("session_start"),
        col("session_window.end").as("session_end"),
        col("user_id"), col("n_events"), col("value_sum"))

  /** Streaming exact dedup on a key, state bounded by the watermark:
    * an event is emitted once; replays arriving within `delay` of the
    * max event time are dropped, and key state older than the
    * watermark is evicted — the unbounded-stream form of the exact
    * dedup the batch path does with a hash group-by. At 100 TB/day the
    * state is O(keys inside the watermark window), not O(stream). */
  def dedupStream(events: DataFrame, keys: Seq[String],
      delay: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", delay)
      .dropDuplicatesWithinWatermark(keys.head, keys.tail: _*)

  /** Stream-stream interval join — event attribution: each purchase
    * joins the views from the same user within the preceding `horizon`.
    * Watermarks on BOTH inputs plus the time-bound join condition are
    * what make this runnable on unbounded streams: Spark buffers each
    * side only until (watermark − horizon) passes an event, so join
    * state is O(events inside the horizon window), not O(stream).
    * Works identically on batch frames (watermarks are no-ops there),
    * which is how the spec pins stream ≡ batch semantics. */
  def attributionJoin(views: DataFrame, purchases: DataFrame,
      horizon: String = "1 hour", delay: String = "10 minutes"): DataFrame = {
    val v = views
      .select(col("user_id"), col("ts").as("view_ts"),
        col("event_id").as("view_id"))
      .withWatermark("view_ts", delay)
    val p = purchases
      .select(col("user_id"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
      .withWatermark("purchase_ts", delay)
    p.join(v, Seq("user_id")).where(
        col("view_ts") <= col("purchase_ts") &&
        col("view_ts") >= col("purchase_ts") - expr(s"INTERVAL $horizon"))
      .select("user_id", "purchase_id", "purchase_ts", "view_id",
        "view_ts", "value")
  }

  /** One observation event for the custom-state operator. */
  case class Obs(indicator: String, year: Int, month: Int, value: Double,
      ts: Timestamp)

  /** Running monthly aggregate state: incremental (sum, count) — the
    * mergeable partial-aggregate form of A1's mean. */
  case class MonthState(sum: Double, count: Long)

  /** Emitted update per batch and key. */
  case class MonthUpdate(indicator: String, year: Int, month: Int,
      value: Double, observation_count: Long)

  /** A1 as explicit streaming state: `flatMapGroupsWithState` keeps a
    * (sum, count) partial aggregate per (indicator, year, month) and
    * emits the refreshed mean whenever a batch touches the key. This is
    * the custom-state escape hatch for aggregates Spark's built-in
    * streaming agg can't express (the built-in covers plain mean —
    * the operator exists to pin the state plumbing: timeout handling,
    * update-mode emission, KeyValueGroupedDataset typing).
    *
    * State is bounded by an optional idle timeout: keys idle longer
    * than `idleTimeoutMs` are evicted — FRED revises recent months, not
    * decade-old ones, so eviction is safe and keeps state O(live keys).
    * Note ProcessingTimeTimeout makes the engine schedule timeout-check
    * batches continuously (a busy trigger loop under the default
    * zero-interval trigger) — production queries pair it with a real
    * `Trigger.ProcessingTime`; pass `idleTimeoutMs = 0` for NoTimeout
    * (unbounded state, bounded batches).
    */
  def runningMonthlyMean(events: Dataset[Obs],
      idleTimeoutMs: Long = 0L): Dataset[MonthUpdate] = {
    import events.sparkSession.implicits._
    val timeout =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout()
      else GroupStateTimeout.NoTimeout()
    events
      .groupByKey(o => (o.indicator, o.year, o.month))
      .flatMapGroupsWithState[MonthState, MonthUpdate](
        OutputMode.Update(), timeout) {
        case ((ind, y, m), rows, state: GroupState[MonthState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val prev = state.getOption.getOrElse(MonthState(0.0, 0L))
            var s = prev.sum; var c = prev.count
            rows.foreach { o => s += o.value; c += 1 }
            state.update(MonthState(s, c))
            if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
            Iterator.single(MonthUpdate(ind, y, m, s / c, c))
          }
      }
  }
}
