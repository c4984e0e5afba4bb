package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Record linkage / entity resolution: align a dirty probe table
  * (OCR'd catalogs, scraped listings, merged CRM extracts) with a
  * canonical entity table without an exact key — the classic
  * blocking → pairwise-scoring → best-match-assignment pipeline
  * (Fellegi–Sunter shape, deterministic scoring).
  *
  * Distinct from the dedup family: [[Dedup]] partitions ONE corpus
  * into duplicate clusters; linkage ASSIGNS each probe record to at
  * most one canonical entity across TWO tables, keeping the
  * similarity as match evidence.
  *
  * Reference scope: the reference engine has no fuzzy matching; its
  * only cross-table alignment is the exact computed-key joins
  * (spark_elt_emr.py:76-79). This extends the engine the way the
  * dedup/ANN families do, reusing their scale discipline.
  *
  * Scale design (the 100 TB posture):
  * - Candidate generation is TOKEN BLOCKING, never a cross join:
  *   only pairs sharing ≥1 name token are scored, via an equi-join
  *   on the token — shuffle-partitioned by token, no broadcast of
  *   either table required.
  * - Frequent blocking tokens are the quadratic escape hatch (a
  *   token in half of each side generates |L|·|R|/4 pairs — the
  *   banded-LSH mega-bucket problem in disguise). `maxTokenDf` drops
  *   tokens above the document-frequency cap on EITHER side before
  *   the join (the [[Dedup]] maxDocFreq stop-cap pattern): standard
  *   blocking practice, because a token that frequent has no
  *   discriminative value. Recall on normal pairs is unaffected as
  *   long as each matchable pair shares at least one rare token.
  * - Scoring is one codegen'd `levenshtein` per DISTINCT candidate
  *   pair (pairs deduped before scoring, so multi-token overlap
  *   doesn't multiply cost).
  * - Assignment is a per-probe window top-1 (rank by similarity,
  *   deterministic tie-break on the canonical id) — Spark plans the
  *   `rn = 1` filter as WindowGroupLimit, so only each probe's best
  *   survivors cross the final exchange.
  */
object Linkage {

  /** For each probe row, the best-matching canonical row by
    * normalized Levenshtein similarity, or no row if nothing clears
    * `minSim`.
    *
    * Output: `(probe_id, probe_name, matched_id, matched_name, sim)`
    * with `sim = round(1 − lev(probe, canon) / max(len), 4)` — an
    * exact rational of two integers, so the score replays
    * bit-identically across engines.
    *
    * Contract: ids non-null; names non-null, whitespace-tokenizable.
    * Ties on `sim` break toward the smallest canonical id
    * (deterministic assignment — same input, same linkage, any
    * layout).
    *
    * @param maxTokenDf drop blocking tokens appearing in more than
    *   this many distinct rows on either side (see scale note above)
    */
  def blockedBestMatch(probe: DataFrame, canonical: DataFrame,
      probeId: String, probeName: String,
      canonId: String, canonName: String,
      minSim: Double = 0.0, maxTokenDf: Int = 10000): DataFrame = {
    val pTok = blockingTokens(probe, probeId, probeName, maxTokenDf)
      .select(col("__id").as("__p_id"), col("__name").as("__p_name"),
        col("__tok"))
    val cTok = blockingTokens(canonical, canonId, canonName, maxTokenDf)
      .select(col("__id").as("__c_id"), col("__name").as("__c_name"),
        col("__tok"))
    val cand = pTok.join(cTok, "__tok")
      .select("__p_id", "__p_name", "__c_id", "__c_name")
      .distinct()
    val scored = cand.withColumn("sim",
      round(lit(1.0) - levenshtein(col("__p_name"), col("__c_name"))
        .cast("double") /
        greatest(length(col("__p_name")), length(col("__c_name")))
        .cast("double"), 4))
    val w = Window.partitionBy(col("__p_id"))
      .orderBy(col("sim").desc, col("__c_id").asc)
    scored
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col("sim") >= minSim)
      .select(col("__p_id").as("probe_id"), col("__p_name").as("probe_name"),
        col("__c_id").as("matched_id"), col("__c_name").as("matched_name"),
        col("sim"))
  }

  /** (id, name, token) blocking pairs: distinct lower-cased
    * whitespace tokens per row, minus tokens whose distinct-row
    * document frequency exceeds `maxTokenDf` (computed with one
    * window over the exploded tokens — the count reuses the
    * token-partitioned exchange the blocking join needs anyway). */
  private def blockingTokens(df: DataFrame, idCol: String,
      nameCol: String, maxTokenDf: Int): DataFrame = {
    val toks = df.select(col(idCol).as("__id"), col(nameCol).as("__name"))
      .withColumn("__tok", explode(array_distinct(
        filter(split(lower(col("__name")), graft.ops.TextAnalysis.WhitespaceClass), t => length(t) > 0))))
    val dfw = Window.partitionBy(col("__tok"))
    toks
      .withColumn("__df", count(lit(1)).over(dfw))
      .filter(col("__df") <= maxTokenDf)
      .drop("__df")
  }
}
