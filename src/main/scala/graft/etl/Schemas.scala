package graft.etl

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

/** The star schema's typed output contract, one StructType per table,
  * transcribed from the reference's data dictionary (reference
  * README.md:85-182). The reference never casts — its PySpark SQL
  * leaves every CSV-scanned column a string and lets consumers hit
  * string math — but its README documents intended types, and our
  * schema boundary makes them real: every build conforms its output
  * here, so `duration` aggregates as an int and `latitude` as a
  * double on the first try.
  *
  * Dictionary "int" → IntegerType, "float" → DoubleType (the
  * dictionary's floats are coordinates/pressure — double is the
  * analytic default and what DuckDB/parquet round-trip cleanly),
  * "datetime" → TimestampType, "bool" → BooleanType, "list" →
  * ArrayType(StringType).
  */
object Schemas {

  val fact: StructType = StructType(Seq(
    StructField("id", StringType),
    StructField("start_time", TimestampType),
    StructField("duration", IntegerType),
    StructField("year", IntegerType),
    StructField("month", IntegerType),
    StructField("start_station_id", IntegerType),
    StructField("end_station_id", IntegerType),
    StructField("bike_id", IntegerType),
    StructField("user_agg_id", StringType),
    StructField("covid_id", DateType),
    StructField("weather_id", TimestampType)))

  val dimTime: StructType = StructType(Seq(
    StructField("start_time", TimestampType),
    StructField("minute", IntegerType),
    StructField("hour", IntegerType),
    StructField("day", IntegerType),
    StructField("week", IntegerType),
    StructField("month", IntegerType),
    StructField("year", IntegerType),
    StructField("weekday", IntegerType)))

  val dimUserAgg: StructType = StructType(Seq(
    StructField("user_agg_id", StringType),
    StructField("usertype", StringType),
    StructField("gender", IntegerType),
    StructField("birth_year", IntegerType)))

  val dimBike: StructType = StructType(Seq(
    StructField("bike_id", IntegerType)))

  val dimCovid: StructType = StructType(Seq(
    StructField("covid_id", DateType),
    StructField("bx_case_count", IntegerType),
    StructField("bx_probable_case_count", IntegerType),
    StructField("bk_case_count", IntegerType),
    StructField("bk_probable_case_count", IntegerType),
    StructField("mn_case_count", IntegerType),
    StructField("mn_probable_case_count", IntegerType),
    StructField("qn_case_count", IntegerType),
    StructField("qn_probable_case_count", IntegerType),
    StructField("si_case_count", IntegerType),
    StructField("si_probable_case_count", IntegerType),
    StructField("incomplete", IntegerType)))

  val dimWeather: StructType = StructType(Seq(
    StructField("weather_id", TimestampType),
    StructField("temperature", IntegerType),
    StructField("dew_point", IntegerType),
    StructField("humidity", IntegerType),
    StructField("wind", StringType),
    StructField("wind_speed", IntegerType),
    StructField("wind_gust", IntegerType),
    StructField("pressure", DoubleType),
    StructField("precip", DoubleType),
    StructField("condition", StringType)))

  val dimStation: StructType = StructType(Seq(
    StructField("station_id", IntegerType),
    StructField("external_id", StringType),
    StructField("name", StringType),
    StructField("short_name", DoubleType),
    StructField("region_id", IntegerType),
    StructField("legacy_id", IntegerType),
    StructField("station_type", StringType),
    StructField("latitude", DoubleType),
    StructField("longtitude", DoubleType), // [sic] reference parity
    StructField("capacity", IntegerType),
    StructField("has_kiosk", BooleanType),
    StructField("electric_bike_surcharge_waiver", BooleanType),
    StructField("eightd_has_key_dispenser", BooleanType),
    StructField("rental_methods", ArrayType(StringType))))

  /** Schema per output table name, as written by the ELT. */
  val byTable: Map[String, StructType] = Map(
    "bikeshare_fact_table" -> fact,
    "dim_time_table" -> dimTime,
    "dim_user_agg_table" -> dimUserAgg,
    "dim_bike_table" -> dimBike,
    "dim_covid_table" -> dimCovid,
    "dim_weather_table" -> dimWeather,
    "dim_station" -> dimStation)

  /** Conform a build's output to its contract: project the schema's
    * columns in order, each TRY_CAST to the target type. try_cast,
    * not cast: under ANSI mode (Spark 4's default) a plain cast
    * throws on the first malformed value, and the crawled data has
    * them (Jersey City `short_name`s like "JC005" under the
    * dictionary's `float`) — NULL-on-malformed is the lenient
    * semantics the reference's implicit casts had. A cast to the
    * column's existing type is a no-op in the plan, so conforming
    * costs nothing where the build is already typed. Columns a cast
    * can't express (string → array) must be parsed by the build
    * BEFORE conforming. */
  def conform(schema: StructType)(df: DataFrame): DataFrame =
    df.select(schema.fields.toIndexedSeq.map(f => col(f.name).try_cast(f.dataType).as(f.name)): _*)
}
