package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One driver-checkable query: a Spark build function plus (when the
  * semantics are ANSI-SQL-expressible) an equivalent DuckDB oracle.
  *
  * Conventions that make the driver's hash-compare deterministic:
  *   - every computed/aggregated column is aliased identically on both
  *     sides (the compare sorts columns by NAME);
  *   - both sides end in the same total ORDER BY over non-null keys;
  *   - floating aggregates are rounded on both sides so summation
  *     order (Spark partial/final agg vs DuckDB) cannot flip a bit;
  *   - integer-ish computed columns are cast to the same width
  *     (DuckDB year()/sum(int) widen to BIGINT/HUGEINT; Spark does not).
  */
final case class GraftQuery(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

trait QueryModule {
  def queries: Seq[GraftQuery]
}
