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

  /** Right-to-erasure (GDPR art. 17 / CCPA deletion) propagation:
    * drop every row belonging to a subject in `subjects`. A plain
    * anti-join — shuffles on the subject key (Spark broadcasts a
    * small subject list on its own; a billion-subject purge list
    * correctly falls back to a shuffled anti-join). */
  def erase(df: DataFrame, idCol: String,
      subjects: DataFrame, subjectIdCol: String): DataFrame =
    df.join(subjects.select(col(subjectIdCol).as(idCol)).distinct(),
      Seq(idCol), "left_anti")

  /** Erasure audit: residual row count per subject — the proof table
    * a deletion job publishes (all zeros after [[erase]]). Subjects
    * with no residue still appear, count 0 (left join), so silence
    * can never be mistaken for success. */
  def erasureAudit(df: DataFrame, idCol: String,
      subjects: DataFrame, subjectIdCol: String): DataFrame =
    subjects.select(col(subjectIdCol).as("subject_id")).distinct()
      .join(df.select(col(idCol).as("subject_id"),
          lit(1L).as("__one")),
        Seq("subject_id"), "left")
      .groupBy(col("subject_id"))
      .agg(sum(coalesce(col("__one"), lit(0L))).as("n_residual"))

  /** Differentially-private cell counts: Laplace(1/ε) noise on each
    * cell of a count release (sensitivity 1). The noise stream is
    * SEEDED — u is the Knuth multiplicative scramble of the cell's
    * rank (the [[graft.ops.Sampling]] replayable-hash mechanism), so
    * tests and the oracle replay it bit-exactly; production swaps the
    * seeded u for secure randomness, keeping the same inverse-CDF
    * transform `−(1/ε)·sign(u−½)·ln(1−2|u−½|)`.
    *
    * Determinism contract: u is exact integer arithmetic over the
    * deterministic cell rank; ln is libm, so the noise is pinned with
    * round(…, 9) before the add (the x97 rule) and the release
    * rounds to 4. The true count rides along for audit/test — a real
    * release drops it.
    *
    * Scale: one map-side-combinable cell count; the rank window runs
    * over |cells| rows (bounded by the release design, not the
    * corpus). */
  def noisyCounts(df: DataFrame, dims: Seq[String], epsilon: Double,
      seed: Long = 42L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(epsilon > 0, "epsilon must be positive")
    val w = Window.orderBy(dims.map(d => col(d).asc): _*)
    val rank = row_number().over(w).cast("long")
    val h = pmod(pmod(rank + seed, lit(2147483648L)) * lit(2654435761L),
      lit(4294967296L))
    val u = (h.cast("double") + lit(0.5)) / lit(4294967296.0)
    val uc = u - lit(0.5)
    val noise = round(
      (lit(-1.0) / epsilon) * signum(uc) * log(lit(1.0) - lit(2.0) * abs(uc)),
      9)
    cells(df, dims.map(col))
      .withColumn("noise", noise)
      .withColumn("noisy_n", round(col("n") + col("noise"), 4))
  }
}
