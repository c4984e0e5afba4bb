package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sessionization: collapse an event stream into per-key activity
  * sessions separated by an inactivity gap — the classic funnel/
  * engagement operator, and in an LLM-data pipeline the grouping
  * step for interaction logs (one session = one conversation-shaped
  * training example).
  *
  * Batch path uses Spark's native `session_window`, which merges
  * events whose timestamps fall within `gap` of the session's
  * current end: one shuffle keyed by (key, merged-window) with
  * map-side partial merging — no self-join, no global sort, and the
  * same expression works under Structured Streaming with a watermark
  * (state evicted once the watermark passes a session's end).
  */
object Sessionize {

  /** Per-session stats: start time, event count, value sum. A new
    * session starts when the gap since the previous event EXCEEDS
    * `gap` — an event landing exactly `gap` after the previous one
    * still extends the session (Spark's session windows are closed
    * at the merge boundary; verified by spec). */
  def sessionStats(events: DataFrame, keyCol: String, tsCol: String,
      valueCol: String, gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        count(lit(1)).as("n_events"),
        round(sum(col(valueCol)), 2).as("session_value"))
      .select(
        col(keyCol),
        col("session_window.start").as("session_start"),
        col("n_events"),
        col("session_value"))

  /** Sessions as closed INTERVALS `[min ts, max ts]` — the input to
    * [[Intervals.overlapJoin]]. `session_end` is the last observed
    * event (not Spark's `session_window.end`, which pads the gap on —
    * an interval bound should be data, not configuration). Same one-
    * shuffle `session_window` plan as [[sessionStats]]. */
  def sessionIntervals(events: DataFrame, keyCol: String, tsCol: String,
      gap: String = "30 minutes"): DataFrame =
    events
      .groupBy(col(keyCol), session_window(col(tsCol), gap))
      .agg(
        min(col(tsCol)).as("session_start"),
        max(col(tsCol)).as("session_end"),
        count(lit(1)).as("n_events"))
      .select(col(keyCol), col("session_start"), col("session_end"),
        col("n_events"))
}
