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
}
