package graft
import org.apache.spark.sql.SparkSession
object Bench {

  /** The shared session shape for timing mains (Bench/Profile). */
  def buildSession(): SparkSession = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
  }

  /** Warmup: touch every table and exercise the scan/shuffle/codegen
    * machinery once so the first timed query doesn't absorb session
    * initialization (class loading, codegen compiler, broadcast env). */
  def warmup(spark: SparkSession, sfDir: String): Unit = {
    Tables.all.foreach { t =>
      // events needs the nanos-timestamp repair — go through its
      // loader, or the warmup read throws and silently skips the table
      try {
        if (t == "events") Tables.events(spark, sfDir).limit(1).count()
        else Tables.load(spark, sfDir, t).limit(1).count()
      } catch { case _: Throwable => () }
    }
    import org.apache.spark.sql.functions._
    spark.range(1000).groupBy((col("id") % 10).as("k"))
      .agg(sum(col("id"))).orderBy(col("k")).count()
  }

  /** Time FULL materialization: fold every output column into one
    * hash aggregate, so column pruning can't silently skip the
    * expensive projections the query claims to compute (.count()
    * lets the scan drop them). XOR-fold, NOT sum: summing random
    * 64-bit hashes overflows a checked long near-certainly under
    * Spark 4's default ANSI mode, and the exception fallback would
    * silently demote every query back to count()-timing. */
  def materialize(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
    import org.apache.spark.sql.functions._
    val cols = df.columns.map(c => col(s"`$c`"))
    try df.select(xxhash64(cols.toIndexedSeq: _*).as("__h"))
      .agg(count(lit(1)), expr("bit_xor(__h)")).collect()
    catch { // un-hashable type fallback — NEVER silent: a demoted
      // timing reverts to count(), which column pruning flatters
      case t: Throwable =>
        System.err.println(
          s"[bench] $name: hash-fold materialization failed " +
            s"(${t.getClass.getSimpleName}: ${t.getMessage}) — timing count() instead")
        df.count()
    }
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = buildSession()
    spark.sparkContext.setLogLevel("WARN")
    warmup(spark, sfDir)
    // natural ordering (q1..q21, x1..x13): deterministic output, and
    // queries sharing memoized artifacts (x8 → x10) run in an order
    // that exercises the reuse path
    val sorted = SparkEntry.queries.toSeq.sortBy { case (name, _) =>
      val m = "([a-z]+)(\\d+)".r.findFirstMatchIn(name)
      (m.map(_.group(1)).getOrElse(name), m.map(_.group(2).toInt).getOrElse(0))
    }
    // diagnostic knob: position-dependent slowdowns (accumulated
    // session state) show up as the slow set FOLLOWING the order
    val ordered =
      if (sys.env.get("SPARK_GRAFT_BENCH_ORDER").contains("reverse"))
        sorted.reverse
      else sorted
    // diagnostic: per-query stage metrics IN SEQUENCE (the in-bench
    // slowdown ProfileQuery's isolated runs can't reproduce)
    val profiling = sys.env.contains("SPARK_GRAFT_BENCH_PROFILE")
    val cpuNs = new java.util.concurrent.atomic.LongAdder
    val runMs = new java.util.concurrent.atomic.LongAdder
    val stages = new java.util.concurrent.atomic.LongAdder
    val listener: Option[org.apache.spark.scheduler.SparkListener] =
      if (!profiling) None
      else Some(new org.apache.spark.scheduler.SparkListener {
        override def onStageCompleted(
            e: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
          val m = e.stageInfo.taskMetrics
          if (m != null) {
            cpuNs.add(m.executorCpuTime); runMs.add(m.executorRunTime)
            stages.increment()
          }
        }
      })
    listener.foreach(spark.sparkContext.addSparkListener)
    val results = try ordered.map { case (name, fn) =>
      if (profiling) { cpuNs.reset(); runMs.reset(); stages.reset() }
      val t0 = System.nanoTime()
      try { materialize(name, fn(spark, sfDir)) } catch {
        case t: Throwable =>
          System.err.println(s"[bench] $name: query failed " +
            s"(${t.getClass.getSimpleName}: ${t.getMessage})")
      }
      val wall = (System.nanoTime() - t0) / 1e9
      if (profiling) {
        Thread.sleep(200) // listener bus settles async
        System.err.println(f"[bench-profile] $name wall=$wall%.3f " +
          f"cpu=${cpuNs.sum / 1e9}%.3f taskRun=${runMs.sum / 1e3}%.3f " +
          f"stages=${stages.sum}")
      }
      name -> wall
    } finally {
      // a second profiled runBench in this JVM must not double-count:
      // the LongAdders are shared, so a leaked listener keeps feeding
      listener.foreach(spark.sparkContext.removeSparkListener)
    }
    val total = results.map(_._2).sum
    // full-name, full-precision line — archived to a file (complete
    // regardless of the driver's capture length)
    val fullQs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fullLine =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":$fullQs,"sf":"$sfDir"}"""
    val out = sys.env.getOrElse("SPARK_GRAFT_BENCH_OUT", "/tmp/graft_bench.json")
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get(out),
        (fullLine + "\n").getBytes(java.nio.charset.StandardCharsets.UTF_8))
      System.err.println(s"[bench] archived to $out")
    } catch { case t: Throwable =>
      System.err.println(s"[bench] archive to $out failed: ${t.getMessage}")
    }
    // stdout line LAST, and compact: the driver keeps only the final
    // 2000 chars of output, and 76 full-name full-precision entries
    // are ~2.4k chars — rounds 1-4 all came back `parsed: null` from
    // head-truncation. Short ids ("q1", "x18" — the driver contract's
    // own example form) at ms precision keep the line ~900 chars with
    // room to grow; full names live in the archive file above.
    val shortId = "^([a-z]+\\d+)".r
    val shortKeys = results.map { case (k, _) =>
      shortId.findFirstIn(k).getOrElse(k)
    }
    val keys = // fall back to full names on any collision — never drop a number
      if (shortKeys.distinct.length == shortKeys.length) shortKeys
      else results.map(_._1)
    val qs = keys.zip(results.map(_._2)).map { case (k, v) =>
      s"\"" + k + "\":" + BigDecimal(v).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    }.mkString("{", ",", "}")
    val shortTotal = BigDecimal(total).setScale(3, BigDecimal.RoundingMode.HALF_UP)
    println(
      s"""{"metric":"total","value":$shortTotal,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
