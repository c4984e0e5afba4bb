package graft.functions

import graft.SparkTestSession
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native [[CharEntropy]] expression must be BIT-identical to the
  * higher-order-function fold it replaced (r20 opt) — same code-point
  * element identity as `split(text, "")`, same p·ln(p) doubles, same
  * sorted left fold. Compared UNROUNDED via double equality (`===` on
  * the raw doubles), not through round(): a rounding boundary could
  * mask a real divergence. */
class CharEntropySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val fixtures = Seq(
    "a", // single char: entropy -0.0/0.0
    "aa", // one distinct char, n=2
    "ab", "abab", "aabb",
    "the quick brown fox jumps over the lazy dog", // spaces count
    "héé déjà vu ééé", // multibyte Latin-1 supplement
    "a😀b😀", // surrogate pairs: code-point identity
    "x\ty\nz", // whitespace variety
    "ññañ üüü ß", // repeated multibyte
    "0123456789" * 20, // uniform distribution, longer doc
    "z" + ("ab" * 50) // skewed distribution
  )

  test("native char_entropy == HOF fold on fixtures, bit-exact") {
    val df = fixtures.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "t")
    val rows = df.select(col("id"),
        TextAnalysis.charEntropy(col("t")).as("native"),
        TextAnalysis.charEntropyFold(col("t")).as("fold"))
      .collect()
    rows.foreach { r =>
      val (n, f) = (r.getDouble(1), r.getDouble(2))
      assert(java.lang.Double.doubleToRawLongBits(n)
          == java.lang.Double.doubleToRawLongBits(f),
        s"id=${r.getLong(0)}: native=$n fold=$f (bits differ)")
    }
  }

  test("native char_entropy == HOF fold on the sf0.001 corpus, bit-exact") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
      .filter(col("text").isNotNull && length(col("text")) > 0)
    val diff = docs.select(
        TextAnalysis.charEntropy(col("text")).as("native"),
        TextAnalysis.charEntropyFold(col("text")).as("fold"))
      .filter(col("native") =!= col("fold"))
      .limit(1).collect()
    assert(diff.isEmpty, s"corpus divergence: ${diff.mkString}")
  }

  test("null propagates, empty string is the empty fold") {
    val df = Seq((1L, null: String), (2L, "")).toDF("id", "t")
    val rows = df.select(col("id"),
      TextAnalysis.charEntropy(col("t")).as("e")).collect()
    assert(rows.find(_.getLong(0) == 1L).get.isNullAt(1))
    assert(rows.find(_.getLong(0) == 2L).get.getDouble(1) == 0.0)
  }
}
