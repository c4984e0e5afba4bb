package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
import org.scalatest.funsuite.AnyFunSuite

/** The native [[FoldSum]] must be BIT-identical to the interpreted
  * HOF fold it replaced — same array order, same addition chain,
  * same null algebra (a NULL element/field makes the result NULL,
  * the HOF's sticky accumulator), same empty-array zero. Compared
  * UNROUNDED via raw double bits. */
class FoldSumSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def native(arr: Column, field: Option[String] = None): Column =
    column(FoldSum(expression(arr), field))

  private def hofPlain(arr: Column): Column =
    aggregate(arr, lit(0.0), (acc, x) => acc + x)

  private def hofField(arr: Column, f: String): Column =
    aggregate(arr, lit(0.0), (acc, s) => acc + s.getField(f))

  private def assertBitEqual(rows: Array[org.apache.spark.sql.Row]): Unit =
    rows.foreach { r =>
      val (n, h) = (r.isNullAt(1), r.isNullAt(2))
      assert(n == h, s"null mismatch on ${r.get(0)}: native=$n hof=$h")
      if (!n) assert(java.lang.Double.doubleToRawLongBits(r.getDouble(1))
          == java.lang.Double.doubleToRawLongBits(r.getDouble(2)),
        s"bits differ on ${r.get(0)}: ${r.getDouble(1)} vs ${r.getDouble(2)}")
    }

  test("plain double arrays: native == HOF, incl empty/null/NaN/-0.0") {
    val df = Seq(
      (1L, Seq(1.1, 2.2, 3.3)),
      (2L, Seq.empty[Double]),
      (3L, Seq(0.1, -0.1, 1e-17, 1.0)), // non-associative chain
      (4L, Seq(Double.NaN, 1.0)),
      (5L, Seq(-0.0, 0.0)),
      (6L, Seq(Double.MaxValue, Double.MaxValue)) // overflow to Inf
    ).toDF("id", "a")
    assertBitEqual(df.select(col("id"),
      native(col("a")).as("n"), hofPlain(col("a")).as("h")).collect())
    // NULL array and NULL element
    val nulls = spark.sql(
      "SELECT 7L AS id, CAST(NULL AS ARRAY<DOUBLE>) AS a " +
      "UNION ALL SELECT 8L, array(1.0, CAST(NULL AS DOUBLE), 2.0)")
    assertBitEqual(nulls.select(col("id"),
      native(col("a")).as("n"), hofPlain(col("a")).as("h")).collect())
  }

  test("struct-field folds: native == HOF on the sortedFold shape") {
    val df = Seq(
      (1L, Seq((3L, 0.5), (1L, 0.25), (2L, 1e-9))),
      (2L, Seq.empty[(Long, Double)]),
      (3L, Seq((1L, -0.0), (1L, 0.0)))
    ).toDF("id", "kv")
      .select(col("id"), transform(col("kv"),
        s => struct(s.getField("_1").as("k"), s.getField("_2").as("v")))
        .as("kv"))
    val sorted = sort_array(col("kv"))
    assertBitEqual(df.select(col("id"),
      native(sorted, Some("v")).as("n"), hofField(sorted, "v").as("h"))
      .collect())
    // NULL field value is sticky-NULL in both
    val nulls = spark.sql(
      "SELECT 4L AS id, array(named_struct('k', 1L, 'v', 1.0), " +
      "named_struct('k', 2L, 'v', CAST(NULL AS DOUBLE))) AS kv")
    assertBitEqual(nulls.select(col("id"),
      native(col("kv"), Some("v")).as("n"),
      hofField(col("kv"), "v").as("h")).collect())
  }

  test("int/long/float fields widen exactly like the HOF's cast") {
    val df = spark.sql(
      "SELECT 1L AS id, array(named_struct('k', 1L, 'v', 3), " +
      "named_struct('k', 2L, 'v', 2147483647)) AS kv " +
      "UNION ALL SELECT 2L, array(named_struct('k', 1L, 'v', 7))")
    assertBitEqual(df.select(col("id"),
      native(col("kv"), Some("v")).as("n"),
      hofField(col("kv"), "v").as("h")).collect())
    val fl = Seq((1L, Seq(0.1f, 0.2f, Float.MaxValue))).toDF("id", "a")
    assertBitEqual(fl.select(col("id"),
      native(col("a")).as("n"), hofPlain(col("a")).as("h")).collect())
  }

  test("sortedFold on the sf0.001 corpus replays bit-exact vs the HOF") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .select(col("source"), col("doc_id"),
        (col("n_chars").cast("double") / 7.0).as("v"))
    val kv = sort_array(collect_list(struct(col("doc_id").as("k"),
      col("v").as("v"))))
    val rows = docs.groupBy(col("source"))
      .agg(native(kv, Some("v")).as("n"), hofField(kv, "v").as("h"))
      .select(col("source"), col("n"), col("h")).collect()
    assert(rows.nonEmpty)
    assertBitEqual(rows)
  }
}
