package graft.ops

import graft.SparkTestSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import java.sql.Timestamp

class AsOfSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  private val trips = Seq(
    (1L, "u1", ts("2020-01-01 08:12:00")),
    (2L, "u1", ts("2020-01-01 09:30:00")),
    (3L, "u1", ts("2020-01-01 07:00:00")), // before any obs → null
    (4L, "u2", ts("2020-01-01 08:12:00")), // u2 has its own obs stream
    (5L, "u2", ts("2020-01-01 07:51:00"))  // exactly at obs time → matches (<=)
  ).toDF("trip_id", "key", "t")

  private val obs = Seq(
    ("u1", ts("2020-01-01 07:51:00"), 10.0),
    ("u1", ts("2020-01-01 08:51:00"), 20.0),
    ("u2", ts("2020-01-01 07:51:00"), 99.0)
  ).toDF("key", "ot", "reading")

  test("left as-of: nearest prior observation per key, null when none") {
    val out = AsOf.asofJoin(trips, obs, "t", "ot", Seq("key"), Seq("reading"))
      .select($"trip_id", $"matched_time", $"reading_asof")
      .collect().map(r => r.getLong(0) ->
        (Option(r.getTimestamp(1)).map(_.toString), Option(r.get(2)))).toMap
    assert(out(1L) == (Some("2020-01-01 07:51:00.0"), Some(10.0))) // prior obs
    assert(out(2L) == (Some("2020-01-01 08:51:00.0"), Some(20.0))) // later obs window
    assert(out(3L) == (None, None))                                // before first obs
    assert(out(4L) == (Some("2020-01-01 07:51:00.0"), Some(99.0))) // key isolation
    assert(out(5L) == (Some("2020-01-01 07:51:00.0"), Some(99.0))) // equality matches
  }

  test("inner as-of drops unmatched rows") {
    val out = AsOf.asofJoin(trips, obs, "t", "ot", Seq("key"), Seq("reading"),
      joinType = "inner")
    assert(out.count() == 4)
    assert(out.filter($"trip_id" === 3).count() == 0)
  }

  test("tolerance bounds the match window") {
    // 21 minutes = 1260s: trip 1 (08:12 vs 07:51) matches, trip 2 (09:30 vs 08:51 = 39min) does not
    val out = AsOf.asofJoin(trips, obs, "t", "ot", Seq("key"), Seq("reading"),
      tolerance = Some(lit(1260L)))
    val m = out.select($"trip_id", $"reading_asof")
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(m(1L).contains(10.0))
    assert(m(2L).isEmpty)
  }

  test("keyless as-of is rejected loudly") {
    intercept[IllegalArgumentException] {
      AsOf.asofJoin(trips, obs, "t", "ot", Seq.empty, Seq("reading"))
    }
  }

  test("reproduces the reference's J2 semantics (hour bucket - 540s obs)") {
    // the -540s METAR trick is the bucketed special case of asofJoin:
    // joining trips to :51-past observations as-of equals the J2 equi-join
    val t2 = trips.withColumn("key", lit("all"))
    val o2 = obs.filter($"key" === "u1").withColumn("key", lit("all"))
    val viaAsof = AsOf.asofJoin(t2, o2, "t", "ot", Seq("key"), Seq("reading"))
      .filter($"trip_id".isin(1L, 2L))
      .select($"trip_id", $"reading_asof").as[(Long, Double)].collect().toMap
    assert(viaAsof(1L) == 10.0 && viaAsof(2L) == 20.0)
  }
}
