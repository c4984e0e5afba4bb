package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the storage semantics [[Persistence]]'s scaladoc claims (and
  * that the Classifier memo + admission stream now build on, r18
  * advice): `Dataset.unpersist` does NOT release localCheckpoint
  * blocks (CacheManager no-op), [[Persistence.release]] does.
  * Assertions are subset-based — other suites share the session and
  * may persist/unpersist concurrently. */
class PersistenceSpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def persistentIds: Set[Int] =
    spark.sparkContext.getPersistentRDDs.keySet.toSet

  test("Dataset.unpersist is a no-op on a localCheckpoint; Persistence.release frees it") {
    val before = persistentIds
    val df = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    assert(df.count() == 3)
    val added = persistentIds -- before
    assert(added.nonEmpty, "eager localCheckpoint must register persistent RDD blocks")
    df.unpersist(blocking = true)
    assert(added.subsetOf(persistentIds),
      "Dataset.unpersist must NOT touch checkpoint blocks (CacheManager no-op — " +
        "if this ever starts releasing, Persistence.release is redundant and " +
        "the Classifier eviction comment needs revisiting)")
    Persistence.release(df)
    assert(added.intersect(persistentIds).isEmpty,
      "Persistence.release must unpersist the LogicalRDD's checkpointed RDD")
  }

  test("releaseExcept frees internal checkpoints but keeps the excepted input's") {
    val before = persistentIds
    val input = Seq(1, 2, 3).toDF("x").localCheckpoint(true)
    val inputBlocks = persistentIds -- before
    assert(inputBlocks.nonEmpty)
    // an operator-internal checkpoint derived from the input
    val internal = input.select(($"x" * 2).as("y")).localCheckpoint(true)
    val internalBlocks = persistentIds -- before -- inputBlocks
    assert(internalBlocks.nonEmpty)
    // a frame whose plan joins the internal checkpoint back to the
    // caller's input — the incrementalVerifiedTextDuplicates shape
    val combined = internal.crossJoin(input)
    Persistence.releaseExcept(combined, input)
    assert(internalBlocks.intersect(persistentIds).isEmpty,
      "releaseExcept must free the operator's internal checkpoint")
    assert(inputBlocks.subsetOf(persistentIds),
      "releaseExcept must NOT free the excepted caller input's blocks")
    Persistence.release(input)
  }

  test("release on a non-checkpointed frame is harmless") {
    val plain = Seq(1, 2).toDF("x").filter($"x" > 0)
    Persistence.release(plain) // no LogicalRDD leaf — nothing to do
    assert(plain.count() == 2)
    // a persist()-cached frame is untouched (release only targets
    // LogicalRDD leaves; CacheManager frames keep their own lifecycle)
    val cached = Seq(3, 4).toDF("x").persist()
    assert(cached.count() == 2)
    Persistence.release(cached)
    assert(cached.storageLevel.useMemory, "persist()-cache must survive release")
    cached.unpersist(blocking = true)
  }
}
