package graft.etl

import graft.quality.DataQuality
import org.apache.spark.sql.SparkSession

/** CLI entry for the star-schema ELT + quality gate — the engine's
  * `spark_elt_emr.py` + `spark_check_emr.py` equivalent in one run.
  *
  * Usage: graft.etl.EltMain <inputDir> <outputDir> [--idempotent]
  */
object EltMain {
  def main(args: Array[String]): Unit = {
    require(args.length >= 2,
      "usage: graft.etl.EltMain <inputDir> <outputDir> [--idempotent]")
    // absolutize so logs and written _SUCCESS markers carry stable
    // paths regardless of the caller's working directory (Spark's
    // glob probing logs a benign FileNotFound per pattern either way)
    val Array(inputDir, outputDir) =
      args.take(2).map(p => new java.io.File(p).getAbsolutePath)
    val idempotent = args.contains("--idempotent")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-elt")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    StarSchemaWriter.runElt(spark, inputDir, outputDir, idempotent)
    DataQuality.validate(spark, outputDir, DataQuality.extendedSuite)
    DataQuality.schemaSuite(spark, outputDir)
    println(s"[graft-elt] star schema written to $outputDir; quality + schema checks passed")
    spark.stop()
  }
}
