package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.LogicalRDD

/** Deterministic storage release for `localCheckpoint(true)` frames.
  *
  * `Dataset.unpersist` goes through the CacheManager and only drops
  * plans registered by `persist()` — on a localCheckpointed frame it
  * is a silent no-op, because the checkpoint's storage blocks belong
  * to the underlying RDD, not to a cached plan (the r18 advice on the
  * admission stream found exactly this: "unpersist both frames" via
  * the Dataset API would have released nothing). The blocks ARE
  * reclaimed by the ContextCleaner once the RDD is GC'd, but a
  * long-running stream that checkpoints per micro-batch accumulates
  * them for as long as GC happens to wait.
  *
  * [[release]] frees them deterministically: an eager localCheckpoint
  * Dataset's analyzed plan is exactly one [[LogicalRDD]] leaf holding
  * the checkpointed RDD — unpersist THAT. After release the frame is
  * dead (localCheckpoint truncated its lineage, so there is nothing
  * to recompute from — the Classifier evicted-model rule): call it
  * only when every consumer of the frame has finished, e.g. at the
  * end of a foreachBatch body. On a frame that is not a local
  * checkpoint it releases nothing and is harmless. */
object Persistence {
  def release(df: DataFrame): Unit = releaseExcept(df)

  /** [[release]], minus any [[LogicalRDD]] leaf that also appears in
    * one of `keep`'s plans — for releasing the INTERNAL checkpoints
    * of a frame built from caller-supplied inputs without touching
    * checkpoint blocks the caller still owns. The motivating case
    * (r19 advisor, medium): `incrementalVerifiedTextDuplicates`
    * eagerly checkpoints its candidate frame, which truncates the
    * minhash probe's internal batch-signature checkpoint OUT of the
    * returned plan — the caller's end-of-batch `release` could never
    * reach it, so one orphaned checkpoint's blocks accumulated per
    * micro-batch until GC. The operator now releases its raw probe
    * frame itself, excepting the caller's `batch` input (whose own
    * checkpoint, if any, is not this operator's to free). */
  def releaseExcept(df: DataFrame, keep: DataFrame*): Unit = {
    val keepIds = keep.flatMap(_.queryExecution.analyzed.collect {
      case lr: LogicalRDD => lr.rdd.id
    }).toSet
    df.queryExecution.analyzed.foreach {
      case lr: LogicalRDD if !keepIds.contains(lr.rdd.id) =>
        lr.rdd.unpersist(blocking = false)
      case _ =>
    }
  }
}
