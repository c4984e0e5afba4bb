package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Disclosure-control operators for releasing aggregates over a
  * training/analytics corpus: small-cell suppression is the standard
  * k-anonymity-style gate (census/health-data practice) — an
  * aggregate cell whose population is below `k` re-identifies its
  * members and must be withheld from the release.
  *
  * Scale shape: one map-side-combinable count per cell (the only
  * full-data shuffle, keyed by the release dimensions), then
  * |cells|-sized algebra — the release table never re-scans raw
  * rows. At 100 TB the cell table is the small side by construction
  * (a release with more cells than rows has no cells to suppress).
  */
object Privacy {

  private def cells(df: DataFrame, dims: Seq[Column]): DataFrame =
    df.groupBy(dims: _*).agg(count(lit(1)).as("n"))

  /** The releasable aggregate: cells with population >= k. */
  def releasableCells(df: DataFrame, dims: Seq[Column], k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    cells(df, dims).filter(col("n") >= k)
  }

  /** Suppression accounting per `reportCol` (one of the release
    * dimensions): how many cells the release withholds and how many
    * underlying rows that hides — the table a data-release review
    * actually reads. Integer counts only. */
  def suppressionReport(df: DataFrame, dims: Seq[Column],
      reportCol: String, k: Long): DataFrame = {
    require(k >= 1, "k must be >= 1")
    cells(df, dims)
      .groupBy(col(reportCol))
      .agg(count(lit(1)).as("n_cells"),
        sum(when(col("n") < k, 1L).otherwise(0L)).as("n_suppressed"),
        sum(when(col("n") < k, col("n")).otherwise(0L)).as("rows_suppressed"),
        sum(when(col("n") >= k, col("n")).otherwise(0L)).as("rows_released"))
  }
}
