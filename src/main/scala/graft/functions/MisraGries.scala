package graft.functions

import org.apache.spark.sql.Encoder
import org.apache.spark.sql.expressions.Aggregator

/** Misra–Gries heavy-hitters summary as a typed mergeable Aggregator
  * (Misra & Gries 1982; merge rule from Agarwal et al., "Mergeable
  * Summaries", PODS 2012) — the fixed-memory complement to the
  * count-min sketch ([[CmsEstimate]]): CMS answers point frequency
  * queries, Misra–Gries RETURNS the candidate heavy hitters
  * themselves, with at most `capacity` counters per aggregation
  * buffer no matter the stream length.
  *
  * Guarantees (spec-asserted, and independent of merge order):
  *   - est(x) ≤ true(x)  (decrements only ever undercount)
  *   - true(x) − est(x) ≤ N / capacity  (every unit of subtraction
  *     removes ≥ capacity units of retained count and total removals
  *     can't exceed the N inserted; the classic one-at-a-time
  *     decrement gives N/(capacity+1) — the batched subtract-min in
  *     `reduce` trades that +1 for O(1) amortized updates)
  *   - every x with true(x) > N/capacity is IN the summary.
  *
  * Spark-first shape: `reduce` runs map-side (partial aggregation),
  * so the shuffle carries one ≤capacity-entry map per partition per
  * group, never the token stream. The PODS'12 merge (sum maps, then
  * subtract the (capacity+1)-th largest count and drop ≤0) keeps the
  * bound additive across partitions. Estimates are merge-order-
  * dependent (the bounds are not), so downstream queries must rank
  * on the estimate but assert only the bounds.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, Map[String, Long], Map[String, Long]] {
  require(capacity >= 1, s"capacity must be >= 1, got $capacity")

  override def zero: Map[String, Long] = Map.empty

  override def reduce(b: Map[String, Long], tok: String): Map[String, Long] = {
    if (tok == null) b
    else b.get(tok) match {
      case Some(c) => b.updated(tok, c + 1)
      case None if b.size < capacity => b.updated(tok, 1L)
      case None =>
        // classic MG step: a new key with the map full decrements
        // every counter (the incoming item's single count is the
        // (capacity+1)-th) — batched as "subtract the minimum", which
        // performs several classic steps at once and preserves the
        // invariant (each subtracted unit hits capacity+1 counters)
        val m = b.valuesIterator.min
        b.iterator.collect { case (k, c) if c > m => k -> (c - m) }.toMap
    }
  }

  override def merge(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      val summed = b.foldLeft(a) { case (acc, (k, c)) =>
        acc.updated(k, acc.getOrElse(k, 0L) + c)
      }
      if (summed.size <= capacity) summed
      else {
        // PODS'12: subtract the (capacity+1)-th largest count from
        // all, keep the strictly positive — at most `capacity`
        // survive, and the subtracted amount is covered by the same
        // N/(capacity+1) budget
        val counts = summed.valuesIterator.toArray
        java.util.Arrays.sort(counts)
        val cut = counts(summed.size - (capacity + 1))
        summed.iterator.collect { case (k, c) if c > cut => k -> (c - cut) }.toMap
      }
    }
  }

  override def finish(r: Map[String, Long]): Map[String, Long] = r

  override def bufferEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()

  override def outputEncoder: Encoder[Map[String, Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Map[String, Long]]()
}
