package graft.quality

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The reference's data-quality posture (spark_check_emr.py's named
  * scalar checks — see [[DataQuality]]) applied to the LLM corpus
  * tables: a training-data pipeline gates ingestion on exactly these
  * invariants before any dedup/curation stage trusts the ids.
  *
  * Shape: ONE aggregate per table (map-side partial + single final
  * row), then the scalar results inline into named check rows — the
  * whole gate is two scans at any corpus size, not one scan per
  * check. Output is a driver-comparable relation (check_name,
  * observed, passed) rather than a throw, so the same suite serves
  * both as a registered query (SQL-replayable, hash-checked) and as
  * a gate (`failures == 0`).
  */
object CorpusQuality {

  /** Document + embedding invariants as one ordered relation:
    * (check_name, observed, passed 0/1). `observed` is the violation
    * count (0 when passing), except `embedding_width_uniform` (number
    * of distinct widths, 1 when passing) and the `*_nonempty` rows
    * (row count, > 0 when passing — an empty table must FAIL the
    * gate, like the reference's is_empty checks, and the sums are
    * coalesced so an empty relation can never NULL a `passed` cell
    * past the gate's filter). Duplicate counts are over NON-NULL ids
    * (`count(id) − count(distinct id)`): a NULL id fires
    * `doc_id_not_null` only, not a bogus duplicate. */
  def suite(docs: DataFrame, embeddings: DataFrame): DataFrame = {
    def checkRow(name: String, observed: org.apache.spark.sql.Column,
        passWhen: org.apache.spark.sql.Column => org.apache.spark.sql.Column) =
      struct(lit(name).as("check_name"),
        observed.cast("long").as("observed"),
        passWhen(observed).cast("int").as("passed"))
    def violations(c: org.apache.spark.sql.Column) =
      coalesce(sum(when(c, 1).otherwise(0)), lit(0))
    val docRows = docs.agg(
      count(lit(1)).as("n_rows"),
      (count(col("doc_id")) - countDistinct(col("doc_id"))).as("dup"),
      violations(col("doc_id").isNull).as("nulls"),
      violations(col("n_chars") =!= length(col("text"))).as("mism"),
      violations(!col("lang").isin("en", "de", "es", "fr", "zh")).as("unk"))
      .select(inline(array(
        checkRow("documents_nonempty", col("n_rows"), _ > 0),
        checkRow("doc_id_unique", col("dup"), _ === 0),
        checkRow("doc_id_not_null", col("nulls"), _ === 0),
        checkRow("n_chars_consistent", col("mism"), _ === 0),
        checkRow("lang_known", col("unk"), _ === 0))))
    val embRows = embeddings.agg(
      count(lit(1)).as("n_rows"),
      (count(col("vec_id")) - countDistinct(col("vec_id"))).as("dup"),
      countDistinct(size(col("embedding"))).as("widths"))
      .select(inline(array(
        checkRow("embeddings_nonempty", col("n_rows"), _ > 0),
        checkRow("vec_id_unique", col("dup"), _ === 0),
        checkRow("embedding_width_uniform", col("widths"), _ === 1))))
    docRows.union(embRows).orderBy(col("check_name"))
  }

  /** Gate form: count of failing checks (0 = corpus is ingestible). */
  def failures(docs: DataFrame, embeddings: DataFrame): Long =
    suite(docs, embeddings).filter(col("passed") === 0).count()
}
