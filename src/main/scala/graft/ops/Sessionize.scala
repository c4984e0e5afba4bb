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

  /** Ordered-pair episode support (level-2 sequential pattern mining,
    * the GSP/PrefixSpan entry level): for every event-type pair
    * (a, b), in how many sessions does an `a` occur strictly BEFORE
    * a `b` — subsequence order, not adjacency, which is what
    * separates it from x91's first-order transitions ("users who
    * error EVENTUALLY purchase" is invisible to a next-step matrix
    * when a view sits in between).
    *
    * Sessions are [[topSessionPaths]]'s gaps-and-islands (same gap,
    * same (ts, tie) total order). Each session votes each pair at
    * most ONCE (support is session count, the standard episode
    * semantics). `maxEvents` truncates each session to its first
    * `maxEvents` events before pairing — the quadratic guard: the
    * in-session self-join is O(L²), and one bot mega-session would
    * otherwise dominate the stage (the banded-LSH bucket-cap
    * argument applied to sessions); truncation is deterministic
    * (prefix in session order) and part of the semantics.
    *
    * Deterministic: integer session counts and one division for the
    * support fraction (x166 class).
    *
    * Scale shape: one user-key window exchange builds sessions; the
    * pair join is shuffle-hash on (user, session) with per-session
    * work capped at maxEvents²; the distinct collapses each
    * session's votes BEFORE the global pair count (map-side
    * combinable). \|types\|²-bounded output. */
  def episodeSupport(events: DataFrame, keyCol: String, tsCol: String,
      tieCol: String, typeCol: String, gapSeconds: Long = 1800L,
      maxEvents: Int = 50): DataFrame = {
    require(gapSeconds > 0, "positive gap")
    require(maxEvents >= 2 && maxEvents <= 1000,
      "maxEvents in [2, 1000] — the in-session pair join is O(maxEvents²)")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val prev = lag(col(tsCol), 1).over(w)
    val newSession = when(prev.isNull
      || unix_micros(col(tsCol)) - unix_micros(prev) > gapSeconds * 1000000L, 1L)
      .otherwise(0L)
    val sess = events
      .withColumn("__ns", newSession)
      .withColumn("__sid", sum(col("__ns")).over(w))
      .withColumn("__pos", row_number().over(
        Window.partitionBy(col(keyCol), col("__sid"))
          .orderBy(col(tsCol), col(tieCol))))
      .filter(col("__pos") <= maxEvents)
      .select(col(keyCol).as("u"), col("__sid").as("sid"),
        col("__pos").as("pos"), col(typeCol).as("et"))
      .localCheckpoint(true) // both sides of the in-session join
    val nSessions = broadcast(sess.select(col("u"), col("sid")).distinct()
      .agg(count(lit(1)).as("n_total")))
    val b = sess.select(col("u").as("u_b"), col("sid").as("sid_b"),
      col("pos").as("pos_b"), col("et").as("et_b"))
    sess.hint("shuffle_hash")
      .join(b, col("u") === col("u_b") && col("sid") === col("sid_b")
        && col("pos") < col("pos_b"))
      .select(col("u"), col("sid"), col("et").as("a"), col("et_b").as("b"))
      .distinct()
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).cast("long").as("n_sessions"))
      .crossJoin(nSessions)
      .select(col("a"), col("b"), col("n_sessions"),
        round(col("n_sessions").cast("double")
          / col("n_total").cast("double"), 6).as("support"))
  }
}
