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

  /** Top-k session PATHS — the k-step behavioral patterns (`view >
    * click > purchase`) that first-order transitions (x91) cannot
    * see: sessions form by the gaps-and-islands rule (a new session
    * when the gap STRICTLY exceeds `gapSeconds` — the
    * [[sessionStats]] boundary convention, replayable in ANSI SQL
    * unlike `session_window`), each session's first `maxLen` event
    * types join into a path, and the most common paths surface.
    *
    * Scale shape: the lag flag and the running session-id sum share
    * ONE user-keyed exchange, and the per-session collect groups on
    * (user, session) — a superset of that partitioning, so no second
    * shuffle before the small (path → count) aggregate; the final
    * top-k plans as TakeOrdered, never a total sort. Ties break by
    * path for a total order.
    */
  def topSessionPaths(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapSeconds: Long = 1800L,
      maxLen: Int = 5, k: Int = 20): DataFrame = {
    require(gapSeconds > 0 && maxLen >= 1 && k >= 1, "positive gap/len/k")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull
      || unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    events
      .withColumn("__ns", newSession)
      .withColumn("__sid", sum(col("__ns")).over(w))
      .groupBy(col(keyCol), col("__sid"))
      .agg(sort_array(collect_list(
        struct(col(tsCol), col(tieCol), col(typeCol).as("et")))).as("evs"))
      .select(array_join(
        slice(transform(col("evs"), e => e.getField("et")), 1, maxLen), ">")
        .as("path"))
      .groupBy(col("path"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
      .orderBy(col("n_sessions").desc, col("path"))
      .limit(k)
  }
}
