package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence (funnel) analysis — the classic product
  * query ("view → click → purchase: where do users drop off?") and,
  * on a data pipeline, the ingest-health variant (crawled → cleaned →
  * deduped → packed). First-occurrence semantics: a user reaches step
  * k at the EARLIEST event of type k that is strictly later than
  * their step-(k−1) time.
  *
  * Scale shape: one type-filtered map + user-keyed aggregate per
  * step; each refinement joins the (users-sized, 2-column) reached
  * table back shuffle-hash on the user key — never broadcast (at
  * corpus scale the user table is big) and never a per-user sorted
  * window over the full event stream. The final conversion table is
  * |steps| rows; its window is driver-trivial.
  */
object Funnel {

  /** Per-step reach and conversion for `steps` (ordered event types).
    * Returns (step, step_name, n_users, conv_from_first,
    * conv_from_prev) — one row per step, integer-ratio conversions
    * rounded to 6. `within` bounds each transition (step k within
    * the interval of step k−1) — the "converted within 7 days"
    * form; None leaves transitions unbounded.
    *
    * `within` uses FIRST-TOUCH anchoring (the Amplitude-style
    * convention): the window opens at the user's first step-(k−1)
    * reach time and never re-anchors, so a user whose anchor event
    * repeats and who converts inside a LATER anchor's window counts
    * as not converted. That is a deliberate semantics choice —
    * any-touch matching is sequential pattern search (per-pair range
    * joins), a different and far heavier operator. */
  def funnel(events: DataFrame, userCol: String, tsCol: String,
      typeCol: String, steps: Seq[String],
      within: Option[String] = None): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    val ev = events.select(col(userCol).as("user"),
      col(typeCol).as("et"), col(tsCol).as("t"))
    var prev: Option[DataFrame] = None
    val frames = steps.map { s =>
      val base = ev.filter(col("et") === s)
      val reached = prev match {
        case None =>
          base.groupBy(col("user")).agg(min(col("t")).as("tprev"))
        case Some(p) =>
          // optional conversion window: step k must land within
          // `within` of step k−1 ("purchase within 7 days of view")
          val bound = within.map(iv =>
            col("t") <= col("tprev") + expr(s"interval $iv"))
            .getOrElse(lit(true))
          base.hint("shuffle_hash").join(p.hint("shuffle_hash"), "user")
            .filter(col("t") > col("tprev") && bound)
            .groupBy(col("user")).agg(min(col("t")).as("tprev"))
      }
      prev = Some(reached)
      reached
    }
    val counts = frames.zip(steps).zipWithIndex.map { case ((f, s), i) =>
      f.agg(count(lit(1)).as("n_users"))
        .select(lit(i + 1).as("step"), lit(s).as("step_name"), col("n_users"))
    }.reduce(_.unionByName(_))
    // |steps| rows: the single-partition window is deliberate
    val w = Window.orderBy(col("step"))
    counts
      .withColumn("conv_from_first",
        round(col("n_users") / first(col("n_users")).over(w), 6))
      .withColumn("conv_from_prev",
        round(col("n_users")
          / coalesce(lag(col("n_users"), 1).over(w), col("n_users")), 6))
      .orderBy(col("step"))
  }

  /** Weekly cohort retention: users are cohorted by the week of their
    * first activity, and each (cohort, k) cell counts the cohort
    * members active k weeks later — the standard engagement matrix,
    * and on a data pipeline the re-crawl freshness matrix (how much
    * of week-w's corpus is still being observed at week w+k).
    *
    * Deterministic: dates and integer counts only; retention is a
    * single BIGINT-ratio division.
    *
    * Scale shape: activity reduces to distinct (user, week) in one
    * exchange (weeks-per-user rows a user, not events); the cohort
    * table derives from it and rejoins shuffle-hash on the user key;
    * only the |cohorts|-row size table broadcasts. */
  /** Distinct (user, activity week) — the shared reduction behind
    * [[cohortRetention]] and [[weeklyChurn]]; one definition so week
    * semantics (truncation, timezone) can never diverge between the
    * two matrices. */
  private def activeWeeks(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    events.select(col(userCol).as("user"),
      date_trunc("week", col(tsCol)).cast("date").as("week"))
      .distinct()

  /** Distinct-less (day, user) projection shared by the rolling-
    * uniques pair — same single-definition rationale as
    * [[activeWeeks]]. */
  private def dailyUsers(events: DataFrame, userCol: String,
      tsCol: String): DataFrame =
    events.select(to_date(col(tsCol)).as("day"), col(userCol).as("user"))

  def cohortRetention(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val active = activeWeeks(events, userCol, tsCol)
    val cohort = active.groupBy(col("user"))
      .agg(min(col("week")).as("cohort_week"))
    val sizes = cohort.groupBy(col("cohort_week"))
      .agg(count(lit(1)).as("cohort_size"))
    active.hint("shuffle_hash").join(cohort.hint("shuffle_hash"), "user")
      .withColumn("week_k",
        floor(datediff(col("week"), col("cohort_week")) / 7).cast("int"))
      .groupBy(col("cohort_week"), col("week_k"))
      .agg(count(lit(1)).as("n_active"))
      .join(broadcast(sizes), "cohort_week")
      .select(col("cohort_week"), col("week_k"), col("n_active"),
        round(col("n_active") / col("cohort_size"), 6).as("retention"))
  }

  /** Weekly churn: of the users active in week w, how many are NOT
    * active in week w+1. A user churns at w when their next active
    * week is more than 7 days out (or never comes — the final data
    * week therefore reads 100% churned: right-censoring, not signal;
    * judge it against the following weeks' baseline or trim it).
    *
    * Deterministic: dates and integer-count ratios only.
    *
    * Scale shape: distinct (user, week) in one exchange, then a
    * per-user window over that user's ACTIVE WEEKS (a handful of
    * narrow rows per user, never the event stream), then a tiny
    * per-week aggregate. */
  def weeklyChurn(events: DataFrame, userCol: String,
      tsCol: String): DataFrame = {
    val active = activeWeeks(events, userCol, tsCol)
    val w = Window.partitionBy(col("user")).orderBy(col("week"))
    active
      .withColumn("next_week", lead(col("week"), 1).over(w))
      .withColumn("churned",
        (col("next_week").isNull
          || datediff(col("next_week"), col("week")) > 7).cast("int"))
      .groupBy(col("week"))
      .agg(count(lit(1)).as("n_active"), sum(col("churned")).as("n_churned"))
      .select(col("week"), col("n_active"), col("n_churned"),
        round(col("n_churned") / col("n_active"), 6).as("churn_rate"))
  }

  /** Rolling `windowDays`-day unique users per day via per-day HLL
    * sketches merged across the window — THE scale pattern for
    * rolling distincts: COUNT(DISTINCT) cannot be merged across
    * days (each window re-scans its raw events), but sketches union
    * in O(sketch size), so the event stream is aggregated exactly
    * ONCE and every window after that touches |days| kilobyte-sized
    * sketch rows. Datasketches HLL (`hll_sketch_agg`), ~1.6%
    * relative error at the default lgK=12.
    *
    * Sketch estimates are not ANSI-replayable → rows-only at the
    * driver; [[rollingUniqueUsersExact]] is the hash-green twin and
    * the spec pins the estimate against it. */
  def rollingUniqueUsers(events: DataFrame, userCol: String,
      tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    // checkpoint the (|days|-row) sketch table: it feeds BOTH sides
    // of the range join, and column pruning would otherwise give the
    // days-only side a canonically different aggregate — no
    // ReusedExchange, a second full event scan
    val daily = dailyUsers(events, userCol, tsCol)
      .groupBy(col("day")).agg(hll_sketch_agg(col("user")).as("sk"))
      .localCheckpoint(true)
    val d2 = daily.select(col("day").as("day2"), col("sk"))
    // non-equi join: broadcast the bounded day list explicitly or
    // join selection is left to size estimates (the x43 lesson)
    broadcast(daily.select(col("day")))
      .join(d2, col("day2").between(
        date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("day"))
      .agg(hll_sketch_estimate(hll_union_agg(col("sk")))
        .as("approx_uniques"))
  }

  /** DAU/WAU stickiness per day — the engagement-frequency ratio
    * product analytics reads daily (DAU/MAU at windowDays = 28):
    * stickiness → 1 means the weekly audience shows up every day,
    * → 1/windowDays means each user appears once per window. The
    * ratio view over [[rollingUniqueUsersExact]]'s counts, computed
    * from ONE shared distinct — not two independent scans.
    *
    * Deterministic: exact distinct BIGINT counts, one division
    * (x166 class). Scale shape: distinct (day, user) once
    * (checkpointed — both the daily count and the window expansion
    * read it), the bounded day list broadcasts into the x90 range
    * join, two combinable aggregates, a |days|-row join. */
  def stickiness(events: DataFrame, userCol: String, tsCol: String,
      windowDays: Int = 7): DataFrame = {
    require(windowDays >= 2, "windowDays must be >= 2")
    val du = dailyUsers(events, userCol, tsCol).distinct()
      .localCheckpoint(true)
    val dau = du.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    val d2 = du.select(col("day").as("day2"), col("user"))
    val wau = broadcast(du.select(col("day")).distinct())
      .join(d2, col("day2").between(
        date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("day")).agg(countDistinct(col("user")).as("wau"))
    dau.join(wau, "day")
      .select(col("day"), col("dau"), col("wau"),
        round(col("dau") / col("wau"), 6).as("stickiness"))
  }

  /** Pairwise audience-overlap matrix between event types: for every
    * type pair (a < b), how many distinct users touch BOTH, plus the
    * Jaccard overlap of the two audiences — the "are these surfaces
    * the same people" readout (near-1 Jaccard means the types are
    * redundant signals for any per-user model; near-0 means unioning
    * them genuinely widens coverage).
    *
    * `exact = true` (default, the oracle path): one distinct
    * (type, user) table, self-joined on the user (shuffle-hash; the
    * per-user work is |types-per-user|², bounded by the type
    * vocabulary) and counted per pair — exact BIGINT counts, one
    * division for the Jaccard (x166 class). The cost driver at
    * 100 TB is the distinct + self-join shuffling the full
    * (type, user) table TWICE.
    *
    * `exact = false` is the mergeable-sketch path (the x89
    * discipline): ONE aggregation pass builds an HLL sketch per type
    * (kilobytes each), the pair matrix unions sketches driver-free
    * on a |types|²-row broadcast cross — the corpus is scanned once
    * and never joined. Estimates via inclusion–exclusion
    * (|A∩B| = |A|+|B|−|A∪B|), so small intersections of large
    * audiences carry the usual subtractive-sketch error (~1.6%
    * relative per term at default lgK) — not ANSI-replayable →
    * rows-only; the spec pins it against the exact twin. */
  def audienceOverlap(events: DataFrame, typeCol: String,
      userCol: String, exact: Boolean = true): DataFrame = {
    val tu = events.select(col(typeCol).as("et"), col(userCol).as("u"))
      .filter(col("et").isNotNull && col("u").isNotNull)
    if (exact) {
      val d = tu.distinct().localCheckpoint(true) // both join sides
      val counts = d.groupBy(col("et")).agg(count(lit(1)).as("n"))
      val b = d.select(col("et").as("et_b"), col("u").as("u_b"))
      val both = d.hint("shuffle_hash")
        .join(b, col("u") === col("u_b") && col("et") < col("et_b"))
        .groupBy(col("et"), col("et_b")).agg(count(lit(1)).as("n_both"))
      both
        .join(broadcast(counts.select(col("et").as("__ka"),
          col("n").as("n_a"))), col("et") === col("__ka"))
        .join(broadcast(counts.select(col("et").as("__kb"),
          col("n").as("n_b"))), col("et_b") === col("__kb"))
        .select(col("et").as("type_a"), col("et_b").as("type_b"),
          col("n_a"), col("n_b"), col("n_both"),
          round(col("n_both").cast("double")
            / (col("n_a") + col("n_b") - col("n_both")).cast("double"), 6)
            .as("jaccard"))
    } else {
      val sk = tu.groupBy(col("et"))
        .agg(hll_sketch_agg(col("u")).as("sk"),
          hll_sketch_estimate(hll_sketch_agg(col("u"))).as("n_est"))
        .localCheckpoint(true) // |types| rows feed both cross sides
      val b = sk.select(col("et").as("et_b"), col("sk").as("sk_b"),
        col("n_est").as("n_b"))
      val est = col("n_est") + col("n_b") -
        hll_sketch_estimate(hll_union(col("sk"), col("sk_b")))
      sk.crossJoin(broadcast(b)).filter(col("et") < col("et_b"))
        .select(col("et").as("type_a"), col("et_b").as("type_b"),
          col("n_est").as("n_a"), col("n_b"),
          greatest(est, lit(0.0)).as("n_both_est"))
    }
  }

  /** Markov removal-effect attribution (Anderl et al. 2014's
    * data-driven alternative to x155's first/last-touch rules): model
    * each user's pre-conversion journey as a first-order absorbing
    * Markov chain (START → channel states → CONV/DROP), compute the
    * conversion probability from START, then re-compute it with each
    * channel knocked out (every transition INTO the channel
    * redirected to DROP). A channel's removal effect
    * `1 − P_removed/P_full` is the conversion share that would
    * vanish without it — credit that position-based rules
    * structurally cannot assign (a middle channel that feeds every
    * converting path gets zero credit from first- AND last-touch).
    *
    * Journey semantics: events restricted to `channels :+ convType`
    * (the declared state space), ordered per user by (ts, id); the
    * journey ends at the FIRST `convType` event (→ CONV) or at the
    * stream's end (→ DROP). A user whose first event converts
    * contributes START→CONV directly. Users with no in-scope events
    * don't appear.
    *
    * Determinism contract (the x97/x78 iterative discipline):
    * transition weights are single divisions of exact BIGINT counts,
    * each absorption round folds its ≤|states| terms keyed by target
    * state (sorted fold) and pins the round's vector to round(_, 9),
    * so all `iters` rounds replay bit-identically in ANSI SQL.
    * `iters` bounds path length considered (journeys longer than
    * `iters` hops contribute no mass yet — the truncation is part of
    * the contract, not an approximation knob to tune blindly).
    *
    * Scale shape: the per-user window (one hash shuffle on the user
    * key, narrow columns) and the |states|²-bounded transition count
    * are the ONLY corpus-sized stages; every absorption round —
    * (1 + |channels|) variants × `iters` rounds — runs on the tiny
    * transition matrix (auto-broadcast joins, eagerly checkpointed
    * so plans stay flat). Returns one row per channel: p_removed,
    * p_full, removal_effect, share (share = effect / Σ effects). */
  def markovAttribution(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String, convType: String,
      channels: Seq[String], iters: Int = 4): DataFrame = {
    require(iters >= 1 && iters <= 16, "iters in [1, 16]")
    require(channels.nonEmpty, "channels must be non-empty")
    require(!channels.contains(convType), "convType is not a channel")
    require(channels.distinct.size == channels.size,
      "duplicate channels would duplicate removal variants")
    val START = "__start"; val CONV = "__conv"; val DROP = "__drop"
    require(!(channels :+ convType).exists(Set(START, CONV, DROP)),
      "channel names may not collide with the reserved chain states")
    val w = Window.partitionBy(col("user")).orderBy(col("t"), col("eid"))
    val wu = Window.partitionBy(col("user"))
    val ev = events
      .select(col(userCol).as("user"), col(tsCol).as("t"),
        col(idCol).as("eid"), col(typeCol).as("et"))
      .filter(col("et").isin((channels :+ convType).map(c => c: Any): _*))
      .withColumn("rn", row_number().over(w))
      .withColumn("conv_rn",
        min(when(col("et") === convType, col("rn"))).over(wu))
    val kept = ev.filter(col("conv_rn").isNull || col("rn") < col("conv_rn"))
    val wk = Window.partitionBy(col("user")).orderBy(col("rn"))
    val term = when(col("conv_rn").isNotNull, lit(CONV)).otherwise(lit(DROP))
    val body = kept
      .withColumn("nxt", lead(col("et"), 1).over(wk))
      .select(col("et").as("s"), coalesce(col("nxt"), term).as("t2"))
    val startRows = ev.filter(col("rn") === 1)
      .select(lit(START).as("s"),
        when(col("conv_rn") === 1, lit(CONV)).otherwise(col("et")).as("t2"))
    val trans = body.union(startRows)
      .groupBy(col("s"), col("t2")).agg(count(lit(1)).as("n"))
    val totals = trans.groupBy(col("s")).agg(sum(col("n")).as("ns"))
    val tmat = trans.join(broadcast(totals), "s")
      .select(col("s"), col("t2"),
        (col("n").cast("double") / col("ns").cast("double")).as("w"))
      .localCheckpoint(true)
    val states = tmat.select(col("s")).distinct().localCheckpoint(true)

    def absorb(removed: Option[String]): DataFrame = {
      var p = states.select(col("s"),
        lit(0.0).as("p")).localCheckpoint(true)
      for (_ <- 1 to iters) {
        val pv = p.select(col("s").as("t2"), col("p").as("pv"))
        val base = when(col("t2") === CONV, lit(1.0))
          .when(col("t2") === DROP, lit(0.0))
        val value = removed
          .map(c => base.when(col("t2") === c, lit(0.0)))
          .getOrElse(base)
          .otherwise(coalesce(col("pv"), lit(0.0)))
        p = tmat.join(pv, Seq("t2"), "left")
          .groupBy(col("s"))
          .agg(round(Classifier.sortedFold(col("t2"), col("w") * value), 9)
            .as("p"))
          .localCheckpoint(true)
      }
      p
    }

    val pFull = broadcast(absorb(None).filter(col("s") === START)
      .select(col("p").as("p_full")))
    val removed = channels.sorted.map { c =>
      absorb(Some(c)).filter(col("s") === START)
        .select(lit(c).as("channel"), col("p").as("p_removed"))
    }.reduce(_ union _)
    val re = removed.crossJoin(pFull)
      .select(col("channel"), col("p_removed"), col("p_full"),
        round(when(col("p_full") > 0,
          lit(1.0) - col("p_removed") / col("p_full")), 6)
          .as("removal_effect"))
      .localCheckpoint(true)
    val tot = broadcast(re.agg(Classifier.sortedFold(col("channel"),
      coalesce(col("removal_effect"), lit(0.0))).as("sum_re")))
    re.crossJoin(tot)
      .select(col("channel"), col("p_removed"), col("p_full"),
        col("removal_effect"),
        round(when(col("sum_re") > 0,
          col("removal_effect") / col("sum_re")), 6).as("share"))
  }

  /** Association rules over per-user behavior (the market-basket
    * classics on [[audienceOverlap]]'s co-audience counts): for every
    * DIRECTED type pair a→b, `confidence = P(b|a) = n_both/n_a`
    * and `lift = P(a,b)/(P(a)·P(b))` against the total user base —
    * confidence near 1 with lift near 1 is just "b is common";
    * confidence with HIGH lift is an actual behavioral rule, the
    * distinction raw overlap can't make. Emits both directions of
    * each co-audience pair (confidence is asymmetric; lift is shared).
    *
    * Deterministic: exact distinct-user BIGINT counts through fixed
    * division trees (x166 class).
    *
    * Scale shape: rides the [[audienceOverlap]] exact path — one
    * distinct (type, user) table, one shuffle-hash self-join on the
    * user key, |types|²-bounded everything after; the single-row
    * user-base count broadcasts. */
  def associationRules(events: DataFrame, typeCol: String,
      userCol: String): DataFrame = {
    val tu = events.select(col(typeCol).as("et"), col(userCol).as("u"))
      .filter(col("et").isNotNull && col("u").isNotNull)
    val d = tu.distinct().localCheckpoint(true)
    val nUsers = broadcast(d.select(col("u")).distinct()
      .agg(count(lit(1)).as("n_users")))
    val counts = d.groupBy(col("et")).agg(count(lit(1)).as("n"))
    val b = d.select(col("et").as("et_b"), col("u").as("u_b"))
    val both = d.hint("shuffle_hash")
      .join(b, col("u") === col("u_b") && col("et") =!= col("et_b"))
      .groupBy(col("et"), col("et_b")).agg(count(lit(1)).as("n_both"))
    val nU = col("n_users").cast("double")
    both
      .join(broadcast(counts.select(col("et").as("__ka"),
        col("n").as("n_a"))), col("et") === col("__ka"))
      .join(broadcast(counts.select(col("et").as("__kb"),
        col("n").as("n_b"))), col("et_b") === col("__kb"))
      .crossJoin(nUsers)
      .select(col("et").as("antecedent"), col("et_b").as("consequent"),
        col("n_a"), col("n_b"), col("n_both"),
        round(col("n_both").cast("double") / nU, 6).as("support"),
        round(col("n_both").cast("double") / col("n_a").cast("double"), 6)
          .as("confidence"),
        round((col("n_both").cast("double") / nU)
          / ((col("n_a").cast("double") / nU)
            * (col("n_b").cast("double") / nU)), 6).as("lift"))
  }

  /** Theil–Sen robust daily-volume trend — the median-based twin of
    * [[volumeTrend]]'s OLS: slope = median of all pairwise day
    * slopes, intercept = median of (y − slope·x). One outage day or
    * one backfill spike drags an OLS line (its breakdown point is a
    * single point); Theil–Sen tolerates ~29% corrupted days — the
    * estimator you gate on when the volume series has incidents in
    * it, which at 100 TB it always does.
    *
    * Determinism: pairwise slopes are single divisions of exact
    * BIGINT differences (identical doubles on any engine); medians
    * are taken by EXPLICIT index arithmetic on the sorted array
    * (odd → middle element, even → the mean of the two middles —
    * one fixed tree), not an interpolating percentile — so the whole
    * estimate replays bit-for-bit (x166 class plus a sort).
    *
    * Scale shape: one map-side-combinable (type, day) count is the
    * only corpus-sized stage; the pair join and both median collects
    * are \|days\|²-bounded per type (the `require` keeps the day
    * span honest — Theil–Sen is quadratic in days BY DEFINITION;
    * for multi-year spans pre-aggregate to weeks). Single-day types
    * report NULL slope/intercept. */
  def robustTrend(events: DataFrame, typeCol: String, tsCol: String,
      maxDays: Int = 1000): DataFrame = {
    require(maxDays >= 2 && maxDays <= 10000,
      "maxDays in [2, 10000] — the pair set is days² per type")
    val daily = events
      .select(col(typeCol).as("et"),
        floor(unix_micros(col(tsCol)) / 86400000000L).cast("long").as("day"))
      .groupBy(col("et"), col("day"))
      .agg(count(lit(1)).cast("long").as("y"))
    val minDay = broadcast(daily.agg(min(col("day")).as("day0")))
    val d = daily.crossJoin(minDay)
      .select(col("et"), (col("day") - col("day0")).as("x"), col("y"))
      .localCheckpoint(true) // pair sides + residual join
    val nDaysChk = broadcast(d.groupBy(col("et"))
      .agg(count(lit(1)).as("n_days")))
    // loud quadratic guard (the stratifiedKfold discipline)
    val capped = nDaysChk.filter(col("n_days") > maxDays)
      .limit(1).collect()
    require(capped.isEmpty,
      s"robustTrend: > $maxDays days for type ${capped.headOption
        .map(_.get(0)).getOrElse("")} — pre-aggregate to weeks")
    def med(arr: org.apache.spark.sql.Column) = {
      val n = size(arr)
      def idx(c: org.apache.spark.sql.Column) = floor(c).cast("int")
      when(n === 0, lit(null).cast("double"))
        .when(n % 2 === 1, element_at(arr, idx((n + 1) / 2)))
        .otherwise((element_at(arr, idx(n / 2))
          + element_at(arr, idx(n / 2) + 1)) / lit(2.0))
    }
    val b = d.select(col("et").as("et_b"), col("x").as("x_b"),
      col("y").as("y_b"))
    val slopes = d
      .join(b, col("et") === col("et_b") && col("x") < col("x_b"))
      .select(col("et"),
        ((col("y_b") - col("y")).cast("double")
          / (col("x_b") - col("x")).cast("double")).as("sl"))
      .groupBy(col("et"))
      .agg(med(sort_array(collect_list(col("sl")))).as("slope"))
    val resid = d.join(broadcast(slopes), Seq("et"), "left")
      .select(col("et"), col("slope"),
        (col("y").cast("double") - col("slope") * col("x").cast("double"))
          .as("r"))
      .groupBy(col("et"))
      .agg(min(col("slope")).as("slope"),
        med(sort_array(collect_list(col("r")))).as("intercept"))
    nDaysChk.join(resid, Seq("et"), "left")
      .select(col("et").as(typeCol), col("n_days"),
        round(col("slope"), 6).as("slope"),
        round(col("intercept"), 6).as("intercept"))
  }

  /** First-order event-transition matrix: P(next event type | current
    * event type) over each user's time-ordered stream — the Markov
    * summary behind "what do users do after an error?" and the
    * session-model prior a sequence-aware sampler needs. `idCol`
    * breaks timestamp ties so the per-user order (and therefore the
    * result) is total and replayable.
    *
    * Deterministic: integer pair counts and one BIGINT-ratio division.
    *
    * Scale shape: one hash shuffle on the user key for the per-user
    * window (narrow columns: user, ts, id, type), then a tiny
    * |types|²-bounded aggregate; the row-count table rejoins
    * broadcast. */
  def eventTransitions(events: DataFrame, userCol: String, tsCol: String,
      idCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col("user")).orderBy(col("t"), col("eid"))
    val pairs = events
      .select(col(userCol).as("user"), col(tsCol).as("t"),
        col(idCol).as("eid"), col(typeCol).as("et"))
      .withColumn("prev_type", lag(col("et"), 1).over(w))
      .filter(col("prev_type").isNotNull)
      .groupBy(col("prev_type"), col("et").as("next_type"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("prev_type"))
      .agg(sum(col("n")).as("n_prev"))
    pairs.join(broadcast(totals), "prev_type")
      .select(col("prev_type"), col("next_type"), col("n"),
        round(col("n") / col("n_prev"), 6).as("p"))
  }

  /** Exact twin of [[rollingUniqueUsers]]: distinct (day, user) once
    * (the only event-stream exchange), then the |days|-bounded range
    * join re-counts each window. Correct at any scale but the window
    * expansion re-ships each day's user set `windowDays` times —
    * which is exactly the cost the sketch variant deletes. */
  def rollingUniqueUsersExact(events: DataFrame, userCol: String,
      tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val du = dailyUsers(events, userCol, tsCol).distinct()
    val days = du.select(col("day")).distinct()
    // the |days|-row side of a non-equi join MUST broadcast
    // explicitly: size estimates deciding otherwise would either
    // cartesian |days| × |day,user| or broadcast the corpus side
    broadcast(days)
      .join(du.select(col("day").as("day2"), col("user")),
        col("day2").between(date_sub(col("day"), windowDays - 1), col("day")))
      .groupBy(col("day"))
      .agg(countDistinct(col("user")).as("n_uniques"))
  }

  /** Exponentially time-decayed engagement score per user:
    * `Σ value · 2^(−age/halfLife)` with age measured from `asOf` —
    * the recency-weighted activity metric behind retention scoring
    * and freshness-weighted sampling (the same decay shape DSIR-style
    * recency reweighting uses on a corpus).
    *
    * Determinism contract: age is exact integer microseconds
    * (unix_micros both engines) divided by exact double constants;
    * each term is pinned with round(…, 9) BEFORE the sum (the x97
    * libm-ulp rule, since pow is platform libm), and the per-user sum
    * folds in (orderCol)-sorted order — the CLAUDE.md keyed sorted
    * fold, bit-replayable against `list_sum(list_transform(
    * list_sort(list(struct_pack(...)))))`.
    *
    * Scale: one map pass for the terms, one user-keyed aggregate.
    * The sorted fold buffers per-user terms — bounded by per-user
    * event counts; the production path at extreme per-user volume is
    * a plain sum (map-side-combinable) at the cost of the exact
    * replay, the x110/x111 exact-vs-scaled pairing. */
  def timeDecayedEngagement(events: DataFrame, userCol: String,
      orderCol: String, tsCol: String, valueCol: String,
      asOf: org.apache.spark.sql.Column,
      halfLifeDays: Double = 7.0): DataFrame = {
    require(halfLifeDays > 0, "halfLifeDays must be positive")
    val ageDays = (unix_micros(asOf) - unix_micros(col(tsCol)))
      .cast("double") / lit(86400000000.0)
    val term = round(col(valueCol) *
      pow(lit(2.0), -(ageDays / lit(halfLifeDays))), 9)
    events
      .select(col(userCol).as("user_id"),
        struct(col(orderCol).as("k"), term.as("v")).as("__kv"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        round({
          import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
          // native fold (r20 opt, FoldSumSpec-pinned bit-equal)
          column(graft.functions.FoldSum(
            expression(sort_array(collect_list(col("__kv")))), Some("v")))
        }, 6).as("score"))
  }

  /** Per-user inter-arrival statistics + burstiness (Goh & Barabási
    * 2008, B = (σ−μ)/(σ+μ) over the gap distribution): the behavioral
    * signature separating periodic/bot traffic (B → −1), Poisson
    * arrivals (B ≈ 0) and bursty humans (B → 1). Gaps are truncated
    * to integer SECONDS so every sum is exact 64-bit arithmetic
    * (micros-squared would overflow; documented bound: Σ gap² per
    * user < 2⁶³ holds for any realistic per-user history), and σ/μ/B
    * derive from those integer sums through one fixed IEEE tree —
    * the x143 determinism contract. Emits only users with ≥ 2 gaps
    * (a variance needs them).
    *
    * Scale shape: one window shuffle on the user key for the lag,
    * then a per-user aggregate riding the same partitioning.
    */
  def interArrivalStats(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol)).orderBy(col(tsCol), col(tieCol))
    // floor-div: the micros delta is < 2^52, so the double division is
    // boundary-safe and floor() == integer division on both engines
    val gapS = floor((unix_micros(col(tsCol))
      - unix_micros(lag(col(tsCol), 1).over(w))) / 1000000L).cast("long")
    val agg = events
      .withColumn("gap_s", gapS)
      .groupBy(col(userCol))
      .agg(count(lit(1)).cast("long").as("n_events"),
        count(col("gap_s")).cast("long").as("n_gaps"),
        sum(col("gap_s")).cast("long").as("sg"),
        sum(col("gap_s") * col("gap_s")).cast("long").as("ssq"))
      .filter(col("n_gaps") >= 2)
    val mean = col("sg").cast("double") / col("n_gaps")
    val variance = greatest(
      col("ssq").cast("double") / col("n_gaps") - mean * mean, lit(0.0))
    val sd = sqrt(variance)
    agg.select(col(userCol), col("n_events"), col("n_gaps"),
      round(mean, 2).as("mean_gap_s"),
      round(sd, 2).as("sd_gap_s"),
      round(when(sd + mean > 0, (sd - mean) / (sd + mean)), 6)
        .as("burstiness"))
  }

  /** Exponentially-weighted daily-volume smoothing per event type —
    * the drift/anomaly baseline every ingestion monitor keeps: each
    * day's count against the decay-weighted mean of the trailing
    * window (`ewma_d = Σ decay^(d-i)·n_i / Σ decay^(d-i)` over
    * observed days i ≤ d), plus the deviation of today's count from
    * that baseline. A day with no events contributes nothing (gap
    * days neither decay nor dilute — the observed-day convention).
    *
    * Scale shape: the event stream reduces ONCE to (type, day)
    * counts — map-side-combinable, the only big-data stage — and the
    * triangular weighting runs on that bounded frame (|types| ×
    * |days|², checkpointed so the count aggregate isn't re-executed
    * for both join sides). Weights/terms are pinned to 9 decimals
    * before a day-keyed sorted fold (the x140 replay discipline), so
    * the smoothing is bit-replayable.
    */
  /** decay^gap weight table, computed DRIVER-side and pinned to 9
    * decimals (the ndcgWeights/poissonThresholds rule): gap exponents
    * are small integers, and the table only needs entries down to the
    * round(9) underflow point (decay^g < 5e-10 pins to exactly 0.0),
    * so ~60 literals replace a data-dependent `pow()` that would
    * otherwise route through each engine's libm right before a
    * rounding boundary. The SAME literals are injected into the x160
    * oracle SQL. */
  def ewmaWeightTable(decay: Double): Array[Double] = {
    require(decay > 0.0 && decay < 1.0, "decay must be in (0,1)")
    val maxG = math.ceil(math.log(5e-10) / math.log(decay)).toInt
    // the table is injected as LITERALS into both the Spark plan
    // (array(lit…)) and the oracle SQL string: decay→1 grows it as
    // ln(5e-10)/ln(decay) (~21k entries at 0.999) — a plan/codegen
    // blowup, not a bigger array. Fail loudly at the size where the
    // literal-table technique stops being the right tool.
    require(maxG <= 512,
      s"decay=$decay needs ${maxG + 1} weight-table literals " +
        "(limit 512, ~= decay <= 0.95) — the table is injected into " +
        "the plan AND the oracle SQL; for slower decays use a " +
        "windowed/recursive EWMA instead")
    (0 to maxG).map(g => BigDecimal(math.pow(decay, g))
      .setScale(9, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
  }

  def ewmaDailyCounts(events: DataFrame, typeCol: String, tsCol: String,
      decay: Double = 0.7): DataFrame = {
    require(decay > 0.0 && decay < 1.0, "decay must be in (0,1)")
    val daily = events
      .select(col(typeCol).as("et"),
        floor(unix_micros(col(tsCol)) / 86400000000L).cast("long").as("day"))
      .groupBy(col("et"), col("day"))
      .agg(count(lit(1)).cast("long").as("n"))
      .localCheckpoint(true) // consumed by both sides of the self-join
    val b = daily.select(col("et").as("et_b"), col("day").as("day_b"),
      col("n").as("n_b"))
    val gap = col("day") - col("day_b")
    val wTab = ewmaWeightTable(decay)
    val wOf = when(gap < wTab.length,
      element_at(array(wTab.toIndexedSeq.map(lit): _*),
        (gap + 1).cast("int"))).otherwise(lit(0.0))
    daily.join(b, col("et") === col("et_b") && col("day_b") <= col("day"))
      .select(col("et"), col("day"), col("n"), col("day_b"),
        round(col("n_b") * wOf, 9).as("term"),
        wOf.as("w"))
      .groupBy(col("et"), col("day"))
      .agg(max(col("n")).as("n"),
        Classifier.sortedFold(col("day_b"), col("term")).as("st"),
        Classifier.sortedFold(col("day_b"), col("w")).as("sw"))
      .select(col("et").as(typeCol), col("day"), col("n"),
        round(col("st") / col("sw"), 6).as("ewma"))
      .withColumn("deviation", round(col("n") - col("ewma"), 6))
  }

  /** Per-type daily-volume OLS trend: closed-form least-squares
    * slope / intercept / R² of daily event counts against the day
    * index — the "is this feed growing, flat, or dying" readout next
    * to [[ewmaDailyCounts]]'s level baseline (EWMA tells you today's
    * deviation; the regression tells you the direction and how
    * linear the ramp is — R² ≈ 1 means steady growth, ≈ 0 means
    * noise around flat).
    *
    * Bit-deterministic WITHOUT sorted folds (the x166 class): days
    * re-index to x = day − min(day) (small integers), so every OLS
    * moment (Σx, Σy, Σxy, Σx², Σy²) is an EXACT BIGINT sum —
    * map-side combinable, order-independent — and the slope /
    * intercept / R² are single divisions of exact integers through a
    * fixed float tree:
    * slope = (nΣxy−ΣxΣy)/(nΣx²−(Σx)²),
    * intercept = (ΣyΣx²−ΣxΣxy)/(nΣx²−(Σx)²),
    * R² = (nΣxy−ΣxΣy)² / ((nΣx²−(Σx)²)(nΣy²−(Σy)²)) with the square
    * taken in double (the integer square can exceed BIGINT).
    * Single-day groups get NULL slope/intercept/R²; constant-count
    * groups get NULL R² (0/0), not NaN.
    *
    * Scale shape: one map-side-combinable (type, day) count is the
    * only corpus-sized stage; the moment aggregate runs over the
    * |types|×|days| daily table and outputs |types| rows. No
    * windows, no joins except the single-row min-day broadcast. */
  def volumeTrend(events: DataFrame, typeCol: String,
      tsCol: String): DataFrame = {
    val daily = events
      .select(col(typeCol).as("et"),
        floor(unix_micros(col(tsCol)) / 86400000000L).cast("long").as("day"))
      .groupBy(col("et"), col("day"))
      .agg(count(lit(1)).cast("long").as("n"))
    val minDay = broadcast(daily.agg(min(col("day")).as("day0")))
    val m = daily.crossJoin(minDay)
      .select(col("et"), (col("day") - col("day0")).as("x"), col("n").as("y"))
      .groupBy(col("et"))
      .agg(count(lit(1)).as("n_days"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("y")).as("sxy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"))
    val num = m("n_days") * m("sxy") - m("sx") * m("sy")
    val denX = m("n_days") * m("sxx") - m("sx") * m("sx")
    val denY = m("n_days") * m("syy") - m("sy") * m("sy")
    m.select(col("et").as(typeCol), col("n_days"), col("sy").as("total"),
      round(when(denX > 0, num.cast("double") / denX.cast("double")), 6)
        .as("slope"),
      round(when(denX > 0,
        (m("sy") * m("sxx") - m("sx") * m("sxy")).cast("double")
          / denX.cast("double")), 6).as("intercept"),
      round(when(denX > 0 && denY > 0,
        (num.cast("double") * num.cast("double"))
          / (denX.cast("double") * denY.cast("double"))), 6).as("r2"))
  }

  /** First/last-touch attribution: every conversion event annotated
    * with the first and the most recent touch event (by the same
    * user, strictly earlier in `(tsCol, tieCol)` order) — the
    * marketing-attribution readout over a raw event log. Touches and
    * conversions are arbitrary predicates, so "purchase attributed to
    * last click-or-view" and "signup attributed to first referral"
    * are both one call.
    *
    * Plan shape: ONE window shuffle on the user key; the
    * ignore-nulls first/last carries and the conversion filter all
    * ride the same sorted partition (no join back to the touch
    * stream — the x14 as-of union trick generalized to in-stream
    * attribution). first/last over the same predicate pick fields
    * from the same row, so type and timestamp always agree.
    */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
      tieCol: String, typeCol: String,
      isTouch: org.apache.spark.sql.Column,
      isConversion: org.apache.spark.sql.Column): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(tieCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    // all four carries in ONE select so they compile to a single
    // Window node (one pass per partition); chained withColumn would
    // plan four Window nodes over the same sort
    events
      .select(col(userCol), col(tsCol), col(tieCol), col(typeCol),
        first(when(isTouch, col(tsCol)), ignoreNulls = true).over(w)
          .as("first_touch_ts"),
        first(when(isTouch, col(typeCol)), ignoreNulls = true).over(w)
          .as("first_touch_type"),
        last(when(isTouch, col(tsCol)), ignoreNulls = true).over(w)
          .as("last_touch_ts"),
        last(when(isTouch, col(typeCol)), ignoreNulls = true).over(w)
          .as("last_touch_type"))
      .filter(isConversion)
  }
}
