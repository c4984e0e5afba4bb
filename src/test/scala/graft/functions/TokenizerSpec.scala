package graft.functions

import graft.SparkTestSession
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The native [[WhitespaceTokens]] byte-scan split must be
  * EXACTLY `split(lower(text), "[ \t\n\f\r]+")` — every empty-segment
  * edge replicated (the x198/x40 lessons: leading/trailing separators,
  * consecutive separators, empty input, \x0B NOT splitting), compared
  * as raw token arrays on fixtures AND the real corpus. */
class TokenizerSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private val fixtures: Seq[String] = Seq(
    "", // empty input -> [""]
    " ", // one separator -> ["", ""]
    "  ", // one RUN of separators -> ["", ""]
    "a", "a b", "a  b", // interior runs collapse
    " a", "a ", " a ", // leading/trailing empties
    "\t\n\f\r", // the full class as one run
    "a\tb\nc\fd\re", // each class member splits
    "ab", // vertical tab is NOT whitespace here (RE2 pin)
    "Mixed CASE Tokens", // lower() composes
    "héé DÉJÀ vu", // multibyte lowercasing
    "a😀b c😀", // surrogate pairs pass through untouched
    "  leading and  trailing  ", // combined edges
    "word" * 200 + " tail" // a long single token
  )

  test("native ws_tokens == regex split on every edge fixture, incl nulls") {
    val df = (fixtures.map(Option(_)) :+ None).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    val rows = df.select(col("id"),
        TextAnalysis.tokens(col("t")).as("native"),
        TextAnalysis.tokensRegex(col("t")).as("regex"))
      .collect()
    rows.foreach { r =>
      assert(r.isNullAt(1) == r.isNullAt(2), s"id=${r.getLong(0)} null diff")
      if (!r.isNullAt(1))
        assert(r.getSeq[String](1) == r.getSeq[String](2),
          s"id=${r.getLong(0)}: native=${r.getSeq[String](1)} regex=${r.getSeq[String](2)}")
    }
  }

  test("declared schema matches the regex split's") {
    val df = Seq("a b").toDF("t")
    val native = df.select(TextAnalysis.tokens(col("t")).as("toks"))
    val regex = df.select(TextAnalysis.tokensRegex(col("t")).as("toks"))
    assert(native.schema == regex.schema,
      s"native=${native.schema.catalogString} regex=${regex.schema.catalogString}")
  }

  test("native ws_tokens == regex split on the sf0.001 corpus") {
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val diff = docs.select(
        TextAnalysis.tokens(col("text")).as("native"),
        TextAnalysis.tokensRegex(col("text")).as("regex"))
      .filter(!(col("native") <=> col("regex")))
      .count()
    assert(diff == 0L, s"$diff corpus docs tokenize differently")
  }
}
