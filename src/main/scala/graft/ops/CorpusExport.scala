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
    * hive-partitioned shards. Returns the assignment table's shard
    * count. Contract: every doc id must have an assignment row — a
    * missing one fails the write loudly (an inner join would
    * silently drop corpus data when the id sets diverge); assignment
    * rows for ids absent from `docs` are ignored (a lookup table may
    * legitimately outlive a filtered corpus slice). */
  def writeShards(docs: DataFrame, assignments: DataFrame, idCol: String,
      outDir: String, chunksPerShard: Int = 64): Long = {
    require(chunksPerShard > 0, "chunksPerShard must be positive")
    // the guard rides the kept column, so it cannot be pruned away
    // and costs no extra job — it evaluates during the write itself
    val joined = docs
      .join(assignments.select(col(idCol), col("start_chunk")),
        Seq(idCol), "left_outer")
      .withColumn("start_chunk",
        when(col("start_chunk").isNull, raise_error(lit(
          "writeShards: document without a packing assignment — " +
            "docs and assignments must cover the same ids")))
          .otherwise(col("start_chunk")))
    val sharded = joined
      .withColumn("shard", expr(s"start_chunk div $chunksPerShard"))
      .repartition(col("shard"))
      // shard FIRST: the dynamic-partition writer requires its sort
      // prefix on the partition column — ordered by id alone it would
      // re-sort on shard, and a spilling task's merge does not keep
      // the id order stable within equal shard keys
      .sortWithinPartitions(col("shard"), col(idCol))
    sharded.write.mode("overwrite").partitionBy("shard").parquet(outDir)
    // shard count from the tiny assignment side — never a re-read of
    // the written output (a second full-output listing job, and an
    // empty export would crash parquet schema inference)
    assignments.select(expr(s"start_chunk div $chunksPerShard").as("shard"))
      .distinct().count()
  }

  /** JSONL export — the interchange format most training stacks
    * ingest directly: one JSON object per line, gzip-compressed,
    * `maxRecordsPerFile` bounding each shard file (the knob training
    * loaders parallelize over). Files land in deterministic id order
    * within each output file (range layout + in-file sort), so a
    * re-export of identical data is byte-stable per file modulo
    * parquet→json type formatting. Spark's native json writer —
    * distributed, no driver collect. */
  def writeJsonlShards(docs: DataFrame, idCol: String, outDir: String,
      maxRecordsPerFile: Int = 10000): Unit = {
    require(maxRecordsPerFile > 0, "maxRecordsPerFile must be positive")
    docs
      .repartitionByRange(col(idCol))
      .sortWithinPartitions(col(idCol))
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile.toLong)
      .option("compression", "gzip")
      .json(outDir)
  }
}
