package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` aggregates every registered [[QueryModule]]; each entry is
  * one operator from SURVEY.md §2 (or an extension op), and each entry
  * with a DuckDB-expressible oracle also appears in `oracleSql`.
  */
object SparkEntry {

  private def modules: Seq[QueryModule] = Seq(
    graft.queries.Relational,
    graft.queries.Analytics,
    graft.queries.Extensions)

  private lazy val registry: Seq[GraftQuery] = modules.flatMap(_.queries)

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The TPC-H-Q1-shaped pricing summary — scan → partial agg → final
    * agg → sort, the canonical Spark batch plan.
    */
  def entry(spark: SparkSession): DataFrame =
    registry.head.build(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.build).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap
}
