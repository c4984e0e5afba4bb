package graft

import graft.functions.Sketches
import graft.ops.TextAnalysis
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class GraftExtensionsSpec extends AnyFunSuite {
  import SparkTestSession.spark

  test("registered SQL functions match the Column API expressions") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "completely different words here now")).toDF("id", "text")
    docs.createOrReplaceTempView("ext_docs")

    val viaSql = spark.sql(
      """SELECT id, minhash_ngrams(split(lower(text), '\\s+'), 3, 128, 42) AS sig,
                simhash64(split(lower(text), '\\s+'), 42) AS sh
         FROM ext_docs""")
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    val viaApi = docs.select(col("id"),
      Sketches.minhashNgrams(TextAnalysis.tokens(col("text")), 3, 128, 42L).as("sig"),
      Sketches.simhash64(TextAnalysis.tokens(col("text")), 42L).as("sh"))
      .collect().map(r => r.getLong(0) -> ((r.getSeq[Long](1), r.getLong(2)))).toMap
    assert(viaSql.keySet == viaApi.keySet)
    viaSql.foreach { case (k, (sig, sh)) =>
      assert(sig == viaApi(k)._1 && sh == viaApi(k)._2)
    }
  }

  test("cdc_boundaries SQL function: partition covers the text, end always cut") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, "the quick brown fox jumps over the lazy dog"),
      (2L, "tiny")).toDF("id", "text")
    docs.createOrReplaceTempView("cdc_docs")
    val got = spark.sql(
      "SELECT id, cdc_boundaries(text, 8, 16) AS b FROM cdc_docs")
      .collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toMap
    got.foreach { case (id, b) =>
      val n = if (id == 1L) 43 else 4
      assert(b.last == n, s"final boundary must be len: $b")
      assert(b == b.sorted && b.distinct == b, s"sorted distinct: $b")
    }
    // parity with the operator path: same chunks via Dedup.cdcChunks
    val lens = graft.ops.Dedup.cdcChunks(docs, "id", "text")
      .groupBy(col("id")).agg(sum(col("chunk_len")).as("t"), count(lit(1)).as("k"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(lens(1L)._1 == 43L && lens(2L)._1 == 4L)
    assert(lens(1L)._2 == got(1L).length && lens(2L)._2 == got(2L).length)
  }

  test("GraftExtensions injects every descriptor into a fresh extensions object") {
    // getOrCreate would reuse the suite session (extensions ignored), so
    // verify the injection path directly against the extension hooks
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new GraftExtensions().apply(ext) // must not throw; registers every descriptor
    GraftFunctions.register(spark)
    val n = spark.sql(
      "SELECT hyperplane_sig(array(CAST(1.0 AS FLOAT), CAST(0.5 AS FLOAT)), 8, 42) AS s")
      .head().getLong(0)
    assert(n >= 0L && n < 256L) // 8-bit signature
  }

  test("aho_corasick_count SQL function: matches the API path, literal-only patterns") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val docs = Seq((1L, "spark spark table"), (2L, "scan scan scan"),
      (3L, "nothing here"), (4L, "")).toDF("id", "text")
    docs.createOrReplaceTempView("ac_docs")
    // SQL == API on the keywordHitsAuto whole-token convention (caller
    // pads; the SQL surface itself is raw-substring)
    val viaSql = spark.sql(
      """SELECT id, aho_corasick_count(' ' || concat_ws(' ',
           filter(split(lower(text), '[ \t\n\f\r]+'), t -> length(t) > 0))
           || ' ', ' spark ', ' scan ', ' table ') AS n
         FROM ac_docs""")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val viaApi = docs.select(col("id"),
      TextAnalysis.keywordHitsAuto(col("text"),
        Seq("spark", "scan", "table")).as("n"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(viaSql == viaApi, s"sql=$viaSql api=$viaApi")
    assert(viaSql(1L) == 3 && viaSql(2L) == 3 && viaSql(3L) == 0 && viaSql(4L) == 0)
    // overlap counting: adjacent repeats share the delimiter space
    val overlap = spark.sql(
      "SELECT aho_corasick_count(' table table table ', ' table table ') AS n")
      .head().getInt(0)
    assert(overlap == 2)
    // a non-literal pattern must fail loudly at plan time
    val err = intercept[Exception] {
      spark.sql("SELECT aho_corasick_count(text, text) FROM ac_docs").collect()
    }
    assert(err.getMessage.contains("string literal"))
    // ...and so must an empty pattern (the automaton's own require
    // would otherwise only fire inside the first task)
    val empty = intercept[Exception] {
      spark.sql("SELECT aho_corasick_count(text, '') FROM ac_docs").collect()
    }
    assert(empty.getMessage.contains("non-empty"))
  }

  test("cosine_similarity SQL function: exact values, mixed element types") {
    GraftFunctions.register(spark)
    val one = spark.sql(
      """SELECT cosine_similarity(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
                                  array(1.0D, 0.0D)) AS c""").head().getDouble(0)
    assert(one == 1.0)
    val orth = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 0.0D), array(0.0D, 2.0D)) AS c""")
      .head().getDouble(0)
    assert(orth == 0.0)
    // mismatched lengths -> null (zip_with-null-padding parity)
    assert(spark.sql(
      """SELECT cosine_similarity(array(1.0D), array(1.0D, 0.0D)) AS c""")
      .head().isNullAt(0))
    // wrong element type fails at ANALYSIS time, not in an executor
    val e = intercept[Exception] {
      spark.sql("SELECT cosine_similarity(array(1, 2), array(3, 4))").collect()
    }
    assert(e.getMessage.contains("array<float|double>") ||
      e.getMessage.toLowerCase.contains("datatype_mismatch"), e.getMessage)
  }

  test("scrub_pii SQL function matches the Column API scrub") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val dirty = "reach me at a.b@example.com, +1 555 010 2233, host 10.0.0.7 done"
    val viaSql = Seq(Tuple1(dirty)).toDF("text").createOrReplaceTempView("pii_docs")
    val s = spark.sql("SELECT scrub_pii(text) AS s FROM pii_docs").head().getString(0)
    assert(s == "reach me at <EMAIL>, <PHONE>, host <IP> done", s)
    val api = Seq(Tuple1(dirty)).toDF("text")
      .select(TextAnalysis.scrubPii(col("text"))).head().getString(0)
    assert(s == api)
  }

  test("bad arguments produce loud errors") {
    GraftFunctions.register(spark)
    val e = intercept[Exception] {
      spark.sql("SELECT minhash_ngrams(array('a'), 3, 128, 42, 99)").collect()
    }
    assert(e.getMessage.contains("minhash_ngrams"))
  }
}
