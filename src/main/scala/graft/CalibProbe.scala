package graft

import org.apache.spark.sql.SparkSession

/** Calibration-glide diagnostic (r16): runs the bench's Spark calib
  * workload as repeated 5-rep medians in one fresh JVM with nothing
  * else running. The r16 measurement this main produced — median
  * 0.40 → 0.19 s across 100 executions on an idle local[32] VM, no
  * plateau — is why the drift gate moved to the JIT-trivial
  * [[Bench.calibScalarWorkload]] pair: Spark calib pre-vs-post wall
  * conflates whole-stage-codegen warmup with machine speed (the
  * calib_cpu structural-gap class, r14, visible on the wall axis once
  * the r16 conversions lightened the post-suite heap). Re-run this
  * if the glide shape is ever in question: `runMain graft.CalibProbe
  * [rounds]`. */
object CalibProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Bench.calibWorkload(spark) // untimed codegen/JIT warm pass
    val rounds = args.headOption.map(_.toInt).getOrElse(6)
    (1 to rounds).foreach { r =>
      val walls = (1 to 5).map { _ =>
        val t0 = System.nanoTime()
        Bench.calibWorkload(spark)
        (System.nanoTime() - t0) / 1e9
      }
      val med = walls.sorted.apply(walls.size / 2)
      println(f"[calibprobe] round $r median=$med%.3f walls=${walls.map(w => f"$w%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
