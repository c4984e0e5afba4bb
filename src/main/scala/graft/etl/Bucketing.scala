package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers — the co-located join path for repeated
  * large-fact joins (SURVEY §4 / the 100 TB design notes).
  *
  * Writing both join sides bucketed by the join key with the same
  * bucket count lets every subsequent equi-join run shuffle-free:
  * each task reads matching bucket files from both tables and joins
  * locally. The write pays one shuffle once; every downstream join
  * amortizes it. At 100 TB this converts the recurring
  * `lineitem ⋈ orders`-class joins from a full-data exchange into a
  * bucket-local merge.
  *
  * (Bucketing requires the session catalog — `saveAsTable`, not plain
  * `parquet(path)` — which is why these helpers take a table name.)
  */
object Bucketing {

  def writeBucketed(df: DataFrame, table: String, bucketCol: String,
      numBuckets: Int = 32, sortCol: Option[String] = None): Unit = {
    val w = df.write
      .mode(SaveMode.Overwrite)
      .format("parquet")
      .bucketBy(numBuckets, bucketCol)
    sortCol.fold(w)(c => w.sortBy(c)).saveAsTable(table)
  }

  /** True when the physical plan of `df` contains no shuffle exchange
    * — the assertion that a bucketed join is actually co-located. */
  def isShuffleFree(df: DataFrame): Boolean =
    !df.queryExecution.executedPlan.toString.contains("Exchange hashpartitioning")

  def table(spark: SparkSession, name: String): DataFrame = spark.table(name)
}
