package graft.functions

import graft.SparkTestSession
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native one-pass [[BigramBuckets]] / [[CharBigrams]] arrays must
  * EXACTLY equal the exploded-index substr/ascii forms they replaced
  * (r21: those seeked O(len²) per doc). The witnesses here are the
  * transform-built equivalents of the old expressions — same substr,
  * same ascii, same pmod arithmetic, same sequence bounds — compared
  * as whole arrays so position order is pinned too. */
class BigramExprSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  private val B = 512

  // the OLD per-position expressions, array-ified (bit-identical
  // formulation: substr seeks + ascii + pmod / substr(i, 2))
  private def bucketsWitness(s: Column): Column =
    transform(sequence(lit(1), length(s) - 1), i =>
      pmod(ascii(s.substr(i, lit(1))) * 31 + ascii(s.substr(i + 1, lit(1))),
        lit(B)))
  private def gramsWitness(s: Column): Column =
    transform(sequence(lit(1), greatest(length(s) - 1, lit(1))), i =>
      s.substr(i, lit(2)))

  private def native(s: Column): Column = column(BigramBuckets(expression(s), B))
  private def nativeGrams(s: Column): Column = column(CharBigrams(expression(s)))

  private val fixtures = Seq(
    "ab", "abc", "the quick brown fox",
    "a b  c\td", // whitespace inside (normalizers collapse, but the expr must not care)
    "héé déjà vu", // multibyte Latin-1: code-point values > 127
    "ñañü ß", // more multibyte
    "a😀b", "😀😀", // surrogate pairs: one code point each
    "0123456789" * 50, // long doc: the seek pathology's home turf
    "z" // single char (grams witness: [z]; buckets callers filter len>=2)
  )

  test("bigram_buckets == the substr/ascii form, array-exact (len >= 2)") {
    val df = fixtures.filter(_.length >= 2).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val rows = df.select(col("id"), native(col("s")).as("n"),
      bucketsWitness(col("s")).as("w")).collect()
    rows.foreach { r =>
      assert(r.getSeq[Int](1) == r.getSeq[Int](2),
        s"id=${r.getLong(0)}: native=${r.getSeq[Int](1)} witness=${r.getSeq[Int](2)}")
    }
  }

  test("char_bigrams == the substr(i,2) form incl the empty/1-char edges") {
    val df = (fixtures :+ "").zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "s")
    val rows = df.select(col("id"), nativeGrams(col("s")).as("n"),
      gramsWitness(col("s")).as("w")).collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2),
        s"id=${r.getLong(0)}: native=${r.getSeq[String](1)} witness=${r.getSeq[String](2)}")
    }
  }

  test("both natives == witnesses on the sf0.001 corpus (normalized text)") {
    val norm = regexp_replace(lower(col("text")),
      graft.ops.TextAnalysis.WhitespaceClass, " ")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull && length(norm) >= 2)
      .select(norm.as("s"))
    val bad = docs.filter(
      !(native(col("s")) <=> bucketsWitness(col("s"))) ||
      !(nativeGrams(col("s")) <=> gramsWitness(col("s")))).count()
    assert(bad == 0L, s"$bad corpus docs diverge")
  }

  test("nulls propagate") {
    val df = Seq[Option[String]](None).toDF("s")
    val r = df.select(native(col("s")), nativeGrams(col("s"))).head()
    assert(r.isNullAt(0) && r.isNullAt(1))
  }
}
