package graft.quality

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Data-quality assertion harness — first-class port of the
  * reference's check script (spark_check_emr.py:20-47, SURVEY §2.4
  * A2-A4): a named check is a scalar query over one table, an
  * expectation, and a comparison; failures throw so a pipeline step
  * fails loudly.
  *
  * Each check is a `COUNT` aggregate — at any scale it's a map-side
  * partial count + single final row, never a collect of data.
  */
final case class QualityCheck(
    checkType: String,
    tableName: String,
    query: DataFrame => Long,
    expected: Long,
    comparison: (Long, Long) => Boolean,
    describeComparison: String)

final case class QualityViolation(message: String)
  extends RuntimeException(message)

object DataQuality {

  /** `is_null` check: count of NULLs in a key column must equal 0
    * (reference spark_check_emr.py:64-67). */
  def isNull(table: String, keyColumn: String): QualityCheck =
    QualityCheck("is_null", table,
      df => df.filter(col(keyColumn).isNull).count(),
      expected = 0L, comparison = _ == _, describeComparison = "==")

  /** `is_empty` check: row count must be > 0
    * (reference spark_check_emr.py:68-85). */
  def isEmpty(table: String): QualityCheck =
    QualityCheck("is_empty", table,
      df => df.count(),
      expected = 0L, comparison = _ > _, describeComparison = ">")

  /** The reference's exact 7-check suite over the star-schema outputs
    * (spark_check_emr.py:63-85; `dim_station` notably unchecked —
    * kept for parity, with a stricter suite available below). */
  def referenceSuite: Seq[QualityCheck] = Seq(
    isNull("bikeshare_fact_table", "id"),
    isEmpty("bikeshare_fact_table"),
    isEmpty("dim_weather_table"),
    isEmpty("dim_covid_table"),
    isEmpty("dim_user_agg_table"),
    isEmpty("dim_time_table"),
    isEmpty("dim_bike_table"))

  /** Extended suite: also guards `dim_station` (the reference forgot
    * it) and the dims' surrogate keys. */
  def extendedSuite: Seq[QualityCheck] = referenceSuite ++ Seq(
    isEmpty("dim_station"),
    isNull("dim_time_table", "start_time"),
    isNull("dim_covid_table", "covid_id"),
    isNull("dim_weather_table", "weather_id"))

  /** Run checks against parquet outputs under `outputDir`
    * (reference table_validate, spark_check_emr.py:20-47). Throws
    * [[QualityViolation]] on the first failure. */
  def validate(spark: SparkSession, outputDir: String,
      checks: Seq[QualityCheck] = referenceSuite): Unit =
    checks.foreach { c =>
      val df = spark.read.parquet(s"$outputDir/${c.tableName}.parquet")
      runCheck(c, df)
    }

  /** Run one check against an in-memory DataFrame (engine-level use,
    * no parquet round-trip). */
  def runCheck(c: QualityCheck, df: DataFrame): Unit = {
    val observed = c.query(df)
    if (!c.comparison(observed, c.expected))
      throw QualityViolation(
        s"${c.checkType} check failed on ${c.tableName}: " +
          s"observed $observed, expected ${c.describeComparison} ${c.expected}")
  }
}
