package graft

import org.apache.spark.sql.functions._

/** Micro-bench for the r21 native tokenizer: times the regex
  * `split(lower(text), WhitespaceClass)` against the native
  * `ws_tokens(lower(text))` over the corpus text repeated enough to
  * dominate fixed overhead, each through a noop sink (guide §1.4) so
  * the tokenize pass itself is what's measured. Medians of warm reps,
  * like the rehearsal mains.
  *
  * Usage: sbt "runMain graft.TokenizeProbe [sfDir] [copies] [reps]"
  */
object TokenizeProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.lift(0).getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(20)
    val reps = args.lift(2).map(_.toInt).getOrElse(5)
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("WARN")
    val base = Tables.documents(spark, sfDir).select(col("text"))
    val corpus = (1 until copies).foldLeft(base)((acc, _) => acc.union(base))
      .localCheckpoint(true) // pin the input so neither variant pays the scan
    val n = corpus.count()
    def time(label: String, c: org.apache.spark.sql.Column): Unit = {
      val walls = (1 to reps).map { _ =>
        val t0 = System.nanoTime()
        corpus.select(size(c).as("k"))
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      val med = walls.sorted.apply(reps / 2)
      println(f"[tokprobe] $label rows=$n median=${med}%.3fs " +
        s"walls=${walls.map(w => f"$w%.3f").mkString(",")}")
    }
    // warm both paths once before timing
    time("regex-warmup", graft.ops.TextAnalysis.tokensRegex(col("text")))
    time("native", graft.ops.TextAnalysis.tokens(col("text")))
    time("regex", graft.ops.TextAnalysis.tokensRegex(col("text")))
    time("native2", graft.ops.TextAnalysis.tokens(col("text")))
    spark.stop()
  }
}
