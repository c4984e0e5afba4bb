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
  /** Poisson(1) inverse-CDF thresholds for [[bootstrapCI]]'s
    * multiplier draw, each pinned to 9 decimals: P(X ≤ k) for
    * k = 0..5 (beyond 5 the weight saturates at 6 — P ≈ 5.9e-4 of
    * draws). Driver-computed literals shipped into both the plan and
    * the oracle SQL (the [[graft.ops.Similarity.ndcgWeights]]
    * discipline — no engine libm in the replay path). */
  def poissonThresholds: Seq[Double] = {
    def r9(v: Double): Double = math.floor(v * 1e9 + 0.5) / 1e9
    val e1 = math.exp(-1.0)
    // cumulative e^-1 * (1 + 1 + 1/2 + 1/6 + 1/24 + 1/120)
    Seq(1.0, 2.0, 2.5, 8.0 / 3, 65.0 / 24, 163.0 / 60)
      .map(c => r9(e1 * c))
  }

  /** Seeded bootstrap confidence interval for a per-group mean — the
    * nonparametric uncertainty readout next to [[abConversionLift]]'s
    * parametric z (use this when the metric is skewed/heavy-tailed
    * and the normal approximation is exactly what you don't trust).
    * The Poisson bootstrap (Chamandy et al. 2012 — the distributed
    * form: each row draws an independent Poisson(1) multiplier per
    * replica, so no replica ever materializes a resample): replica
    * means are `Σ w·x / Σ w`, the CI is the [α/2, 1−α/2] empirical
    * quantile pair of the replica means, taken at index level
    * (floor((n−1)·q)+1 on the sorted array of surviving means —
    * exact, no interpolation).
    *
    * Replayable by construction: the multiplier is the epochShuffle
    * Knuth draw keyed by (id, replica) against [[poissonThresholds]]
    * literals — no RNG state, relayout/re-ingestion stable, ANSI
    * SQL-replayable; with an integer `valueCol` every replica sum is
    * an exact BIGINT (map-side combinable) and each mean is one
    * division (x166 class), so even the sorted-quantile cut
    * replays bit-for-bit.
    *
    * Scale shape: one `reps`-way map-only explode (the multiplier is
    * arithmetic on (id, rep) — no shuffle to draw it), ONE
    * map-side-combinable (group, rep) aggregate, then a
    * |groups|×reps-bounded quantile fold. The corpus shuffles once,
    * carrying (group, rep, two BIGINT partial sums). */
  def bootstrapCI(df: DataFrame, groupCol: String, idCol: String,
      valueCol: String, reps: Int = 40, alpha: Double = 0.05): DataFrame = {
    require(reps >= 10 && reps <= 1000, "reps in [10, 1000]")
    require(alpha > 0 && alpha < 0.5, "alpha in (0, 0.5)")
    // the exact-BIGINT replica sums are the determinism contract; a
    // fractional metric would silently TRUNCATE through cast(long)
    require(Set("long", "int", "integer", "bigint", "smallint", "tinyint")
      .contains(df.schema(valueCol).dataType.typeName),
      s"bootstrapCI: $valueCol must be integral — fractional metrics " +
        "would truncate silently; pre-scale to integer units instead")
    val thr = poissonThresholds
    val u = pmod(
      (pmod(col("id"), lit(2147483648L)) + col("rep") * lit(1000003L))
        * lit(2654435761L), lit(4294967296L)).cast("double") / lit(4294967296.0)
    val w = thr.zipWithIndex.foldRight(lit(6).cast("long")) {
      case ((t, k), rest) => when(u < lit(t), lit(k.toLong)).otherwise(rest)
    }
    val base = df.select(col(groupCol).as("g"), col(idCol).cast("long").as("id"),
      col(valueCol).cast("long").as("x"))
    val repMeans = base
      .select(col("g"), col("id"), col("x"),
        explode(sequence(lit(0L), lit(reps.toLong - 1))).as("rep"))
      .select(col("g"), col("rep"), w.as("w"), col("x"))
      .groupBy(col("g"), col("rep"))
      .agg(sum(col("w") * col("x")).as("swx"), sum(col("w")).as("sw"))
      .select(col("g"), col("rep"),
        round(when(col("sw") > 0,
          col("swx").cast("double") / col("sw").cast("double")), 9)
          .as("m"))
    val point = base.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
    // index the sorted means by the SURVIVING replica count (an
    // all-zero-weight replica of a tiny group yields a NULL mean and
    // drops) — the index arithmetic stays in-bounds by construction
    def qIdx(q: Double) =
      (floor((col("n_reps") - 1) * lit(q)) + 1).cast("int")
    repMeans.groupBy(col("g"))
      .agg(sort_array(collect_list(col("m"))).as("ms"),
        count(col("m")).as("n_reps"))
      .join(point, "g")
      .select(col("g").as(groupCol), col("n"),
        round(col("sx").cast("double") / col("n").cast("double"), 6)
          .as("mean"),
        // n_reps = 0 is reachable (a 1-row group where EVERY replica
        // draws weight 0, p ≈ 0.368^reps): element_at on the empty
        // array would THROW under ANSI mode — degrade to NULL bounds
        // instead, the loud-but-alive readout for degenerate groups
        round(when(col("n_reps") > 0,
          element_at(col("ms"), qIdx(alpha / 2))), 6).as("ci_lo"),
        round(when(col("n_reps") > 0,
          element_at(col("ms"), qIdx(1 - alpha / 2))), 6).as("ci_hi"),
        col("n_reps"))
  }

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
