package graft.ops

import org.apache.spark.sql.DataFrame

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
    * many. The count comes from the planned RDD — no job runs for the
    * scan-shaped inputs the sketch operators feed in here (callers
    * must pass scan/projection frames, not frames whose planning
    * would materialize shuffle stages). */
  def ensure(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
