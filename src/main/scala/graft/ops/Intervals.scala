package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join — the temporal complement of [[AsOf]]: pair
  * every left interval with every right interval it overlaps
  * (`l.start <= r.end AND r.start <= l.end`, closed bounds).
  *
  * A naive non-equi join plans as BroadcastNestedLoopJoin — O(|L|·|R|)
  * comparisons and (CLAUDE.md rule) the streamed side inherits the
  * scan's split count. The scale path is the classic BINNED interval
  * join ("overlap interval join" in DBMS literature; Spark itself has
  * no native operator for it): explode each interval into the
  * fixed-width time bins it covers, equi-join on the bin (hash
  * shuffle, AQE-skew-splittable), then keep the exact-overlap pairs.
  *
  * Dedup without `distinct`: a pair that shares k bins would surface
  * k times, but every overlapping pair is emitted in EXACTLY one bin
  * — the bin of `max(l.start, r.start)` (that instant lies inside
  * both intervals, so both sides exploded it) — so a filter
  * `bin == floor(max(start)/width)` replaces a corpus-wide
  * `distinct` and its extra shuffle.
  *
  * Cost model: candidates = Σ per-bin |L_bin|·|R_bin|; pick
  * `binSeconds` near the median interval length (too narrow → row
  * explosion in the explode; too wide → all-pairs within a bin).
  * Equi-keys (`keys`) compound the join key, so same-key workloads
  * (per-user attribution) never see cross-key candidates at all.
  */
object Intervals {

  /** Overlap-join `left` and `right` on closed intervals given by
    * timestamp columns (`lStart`,`lEnd`) / (`rStart`,`rEnd`), plus
    * optional extra equi-join `keys` present on both sides. All
    * non-key output columns must be pre-aliased disjoint by the
    * caller. Returns one row per overlapping pair, all input columns
    * carried. */
  def overlapJoin(left: DataFrame, right: DataFrame,
      lStart: String, lEnd: String, rStart: String, rEnd: String,
      binSeconds: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binSeconds > 0, "binSeconds must be positive")
    def bin(c: Column): Column = floor(unix_timestamp(c) / binSeconds)
    val la = left.withColumn("__bin",
      explode(sequence(bin(col(lStart)), bin(col(lEnd)))))
    val rb = right.withColumn("__bin",
      explode(sequence(bin(col(rStart)), bin(col(rEnd)))))
    // corpus-sized on both sides: shuffle-hash, never broadcast
    la.hint("shuffle_hash")
      .join(rb.hint("shuffle_hash"), keys :+ "__bin")
      .filter(
        col(lStart) <= col(rEnd) && col(rStart) <= col(lEnd) &&
        col("__bin") === greatest(bin(col(lStart)), bin(col(rStart))))
      .drop("__bin")
  }
}
