package graft.streaming

import graft.{SparkTestSession, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

class EventStreamsSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  // FileStreamSource needs a *directory*; testdata ships one file
  private lazy val eventsDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_stream_src")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sfDir/events.parquet"),
      dir.resolve("events.parquet"))
    dir.toString
  }

  test("hourly windowed counts match the batch equivalent") {
    val stream = EventStreams.fromParquetDir(spark, eventsDir)
    // append mode only emits closed windows; complete mode emits all
    val got = EventStreams.runToMemory(spark,
      EventStreams.hourlyTypeCounts(stream), "hourly_counts",
      OutputMode.Append)
    val batch = Tables.events(spark, sfDir)
      .groupBy(date_trunc("hour", col("ts")).as("hour_start"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
    // watermark closes every window except the tail ones; all emitted
    // windows must agree exactly with the batch result
    val joined = got.alias("s").join(batch.alias("b"),
      Seq("hour_start", "event_type"))
    assert(got.count() > 0)
    assert(joined.filter(col("s.n_events") =!= col("b.n_events")).count() == 0)
  }

  test("stateful per-user activity aggregates every event once") {
    val stream = EventStreams.fromParquetDir(spark, eventsDir)
    val got = EventStreams.runToMemory(spark,
      EventStreams.userActivity(stream).toDF(), "user_activity",
      OutputMode.Update)
    // one micro-batch → one state row per user; totals match batch
    val batch = Tables.events(spark, sfDir)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n"), round(sum(col("value")), 2).as("v"))
    val latest = got.groupBy(col("user_id"))
      .agg(max(col("n_events")).as("n_events"), max(col("total_value")).as("total_value"))
    val joined = latest.join(batch, "user_id")
    assert(joined.filter(col("n_events") =!= col("n")).count() == 0)
    assert(joined.filter(abs(col("total_value") - col("v")) > 0.01).count() == 0)
  }
}
