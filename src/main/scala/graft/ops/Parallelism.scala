package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.exchange.Exchange

/** Parallelism guard for CPU-heavy sketch projections.
  *
  * A small input (one file locally, coarse splits on a cluster) would
  * run an expensive per-row projection — minhash, simhash, hyperplane
  * signatures, winnowing — on too few tasks, bottlenecking the
  * CPU-heavy stage on the file count instead of the core count. But an
  * unconditional `repartition(defaultParallelism)` is a RoundRobin
  * exchange of the FULL corpus: at 100 TB that's an extra shuffle of
  * the largest column in the plan, pure waste when the scan already
  * produced thousands of splits. So: exchange only when the planned
  * partition count is actually below the session's parallelism.
  */
object Parallelism {

  /** `df` re-spread to `defaultParallelism` partitions, or `df`
    * unchanged if its physical partitioning already has at least that
    * many — or if the plan carries its own Exchange (a shuffle
    * re-spreads to `spark.sql.shuffle.partitions` anyway, and probing
    * such a plan would be worse than useless: under AQE, forcing an
    * RDD materializes every query stage eagerly).
    *
    * The probe never runs a job and never builds a throwaway RDD
    * lineage: file-scan split counts come from the already-listed file
    * index via the scan node's input RDD (driver-side split planning
    * only); only exotic non-file leaves fall back to `df.rdd`, which
    * is plain planning for an exchange-free frame. */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    plannedPartitions(df) match {
      case Some(n) if n < target => df.repartition(target)
      case _ => df
    }
  }

  /** Keyed respread with an EXPLICIT width for exchanges whose
    * downstream work FANS OUT (an explode of per-char/per-token
    * indices) — the r21 x97 finding: a bare `repartition(col)` is
    * AQE-coalescible, and coalescing sizes by the exchange's INPUT
    * bytes, blind to the fan-out, so a ~2 MB normalized-text exchange
    * collapses to 1–2 read tasks and the 10M-row explode + bucket
    * hashing behind it runs SERIAL at any core count (profiled:
    * 4.1 s single-task stage inside x97's feature build). An explicit
    * partition count is not AQE-coalescible; the width is
    * max(defaultParallelism, the child's planned width), so it never
    * narrows real scale-out (a corpus-wide scan's thousands of splits
    * win the max) and never drops below the machine locally. */
  def spread(df: DataFrame, keys: org.apache.spark.sql.Column*): DataFrame = {
    val target = math.max(
      df.sparkSession.sparkContext.defaultParallelism,
      plannedPartitions(df).getOrElse(0))
    df.repartition(target, keys: _*)
  }

  /** Planned partition count; None when the plan carries an Exchange
    * whose width is unknown here (already re-spread to
    * `shuffle.partitions` — leave it alone). */
  private def plannedPartitions(df: DataFrame): Option[Int] = {
    // sparkPlan (pre-adaptive physical plan): constructing it plans but
    // never executes, even with AQE on
    val plan = df.queryExecution.sparkPlan
    // a declared output partitioning (user repartition(n, col),
    // coalesce(n), SinglePartition...) propagates up the plan — trust
    // it, or a coalesce(1)/repartition(2, col) input would slip past
    // the guard and run the CPU-heavy sketch on 1-2 cores. EXCEPT
    // when the declared width is exactly the session's
    // shuffle.partitions: that's the config-width exchange every
    // shuffle produces, and re-spreading on top of it would stack a
    // second full exchange whenever defaultParallelism >
    // shuffle.partitions on a cluster (and wreck deliberate hash
    // co-location for nothing).
    val declared = plan.outputPartitioning.numPartitions
    val configWidth = df.sparkSession.sessionState.conf.numShufflePartitions
    if (declared > 0 && declared != configWidth) Some(declared)
    else if (declared > 0 || plan.exists(_.isInstanceOf[Exchange])) None
    else {
      val leaves = plan.collectLeaves()
      val fileSplits = leaves.collect {
        // inputRDDs() builds the FileScanRDD from the file index —
        // driver-side split math, no job
        case f: FileSourceScanExec => f.inputRDDs().map(_.getNumPartitions).sum
      }
      if (fileSplits.length == leaves.length) Some(fileSplits.sum)
      // non-file leaf somewhere (local/in-memory test frames): the
      // frame is exchange-free, so .rdd is planning-only — no AQE
      // stage can fire
      else Some(df.rdd.getNumPartitions)
    }
  }
}
