package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Experimentation analysis over the events stream: the A/B readout
  * every product pipeline bolts onto its funnel — per-arm conversion,
  * absolute lift, and the two-proportion pooled z statistic.
  *
  * Determinism contract: everything derives from INTEGER user/convert
  * counts through one fixed IEEE expression tree (divisions,
  * multiplications and `sqrt` are all correctly-rounded IEEE-754
  * operations — unlike `exp`/`ln`/`pow` there is no libm ulp to pin),
  * so the rounded outputs replay bit-exactly on any engine.
  *
  * Scale shape: one user-keyed aggregate (map-side-combinable max per
  * user), then a single-row conditional aggregate — no joins, no
  * windows, nothing driver-side.
  */
object Experiments {

  /** Two-arm conversion lift: `armCol` must evaluate 0 (control) or
    * 1 (treatment) and be constant per user (a deterministic
    * assignment hash of the user id is the standard shape); a user
    * converts if `convertedCol` is ever true. Returns ONE row:
    * (n_ctrl, n_treat, conv_ctrl, conv_treat, p_ctrl, p_treat,
    * lift, z_score), ratios rounded to 6. */
  def abConversionLift(df: DataFrame, userCol: String,
      armCol: Column, convertedCol: Column): DataFrame = {
    val users = df
      .select(col(userCol).as("__u"), armCol.cast("int").as("__arm"),
        when(convertedCol, 1).otherwise(0).as("__c"))
      .groupBy(col("__u"))
      .agg(max(col("__arm")).as("arm"), max(col("__c")).as("conv"))
    val agg = users.agg(
      sum(when(col("arm") === 0, 1L).otherwise(0L)).as("n_ctrl"),
      sum(when(col("arm") === 1, 1L).otherwise(0L)).as("n_treat"),
      sum(when(col("arm") === 0, col("conv").cast("long"))
        .otherwise(0L)).as("conv_ctrl"),
      sum(when(col("arm") === 1, col("conv").cast("long"))
        .otherwise(0L)).as("conv_treat"))
    val p0 = col("conv_ctrl").cast("double") / col("n_ctrl")
    val p1 = col("conv_treat").cast("double") / col("n_treat")
    val pp = (col("conv_ctrl") + col("conv_treat")).cast("double") /
      (col("n_ctrl") + col("n_treat"))
    val z = (p1 - p0) /
      sqrt(pp * (lit(1.0) - pp) *
        (lit(1.0) / col("n_ctrl") + lit(1.0) / col("n_treat")))
    agg.select(col("n_ctrl"), col("n_treat"),
      col("conv_ctrl"), col("conv_treat"),
      round(p0, 6).as("p_ctrl"), round(p1, 6).as("p_treat"),
      round(p1 - p0, 6).as("lift"), round(z, 6).as("z_score"))
  }

  /** Cohen's kappa between two binary raters — the inter-annotator
    * agreement readout for heuristic labelers (two quality rules, a
    * model vs a rule, two redundant human passes) before either label
    * set is trusted for training. `raterA`/`raterB` must evaluate to
    * booleans. Returns ONE row: the 2×2 confusion matrix, observed
    * agreement `po`, chance agreement `pe`, and
    * `kappa = (po − pe) / (1 − pe)` (ratios rounded to 6; NULL kappa
    * when pe = 1, i.e. at least one rater is constant — agreement is
    * then undefined, not 0, and the NULL makes that loud).
    *
    * Same determinism/scale contract as [[abConversionLift]]: one
    * map-side-combinable conditional aggregate to a single row, all
    * floats derived from integer counts through correctly-rounded
    * IEEE ops.
    */
  def cohensKappa(df: DataFrame, raterA: Column, raterB: Column): DataFrame = {
    val a = raterA.cast("boolean"); val b = raterB.cast("boolean")
    def cell(pa: Column, pb: Column): Column =
      sum(when(pa && pb, 1L).otherwise(0L)).cast("long")
    val agg = df.agg(
      count(lit(1)).cast("long").as("n"),
      cell(!a, !b).as("n00"), cell(!a, b).as("n01"),
      cell(a, !b).as("n10"), cell(a, b).as("n11"))
    val n = col("n").cast("double")
    val po = (col("n00") + col("n11")) / n
    val pa1 = (col("n10") + col("n11")) / n
    val pb1 = (col("n01") + col("n11")) / n
    val pe = pa1 * pb1 + (lit(1.0) - pa1) * (lit(1.0) - pb1)
    agg.select(col("n"), col("n00"), col("n01"), col("n10"), col("n11"),
      round(po, 6).as("po"), round(pe, 6).as("pe"),
      round(when(pe < 1.0, (po - pe) / (lit(1.0) - pe)), 6).as("kappa"))
  }
}
