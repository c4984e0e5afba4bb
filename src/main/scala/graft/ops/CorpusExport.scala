package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Training-shard export — the last step of the curation pipeline:
  * the packed corpus written as hive-partitioned parquet keyed by
  * `shard = start_chunk div chunksPerShard`, so a training job reads
  * its shards with partition pruning (one directory per shard) and
  * inside each shard the docs are in packing order (sorted by id
  * within files).
  *
  * Scale shape: one shuffle keyed by shard (uniform by construction —
  * shards are fixed-size chunk ranges, so hot content cannot skew
  * them), then a partitioned write; the doc payload joins the
  * assignment table on the near-unique id. `chunksPerShard × budget`
  * tokens per shard directory is the knob for shard-file sizing.
  */
object CorpusExport {

  /** Join the corpus onto its packing assignments and write
    * hive-partitioned shards. Returns the shard count. */
  def writeShards(docs: DataFrame, assignments: DataFrame, idCol: String,
      outDir: String, chunksPerShard: Int = 64): Long = {
    require(chunksPerShard > 0, "chunksPerShard must be positive")
    val sharded = docs
      .join(assignments.select(col(idCol), col("start_chunk")), Seq(idCol))
      .withColumn("shard", expr(s"start_chunk div $chunksPerShard"))
      .repartition(col("shard"))
      .sortWithinPartitions(col(idCol))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    docs.sparkSession.read.parquet(outDir)
      .select(col("shard")).distinct().count()
  }
}
