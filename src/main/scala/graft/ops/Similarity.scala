package graft.ops

import graft.functions.{Sketches, VectorMath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two paths, same API:
  *   - [[bruteForceTopK]]: exact cosine against every vector — one
  *     map-only pass + TakeOrdered(k). The correctness baseline, and
  *     at 100 TB still embarrassingly parallel (no shuffle), just
  *     paying full scan cost per query.
  *   - [[lshTopK]]: hyperplane-LSH prefilter — only vectors whose bit
  *     signature is within `maxSigHamming` of the query's are scored.
  *     The signature compare is a cheap codegen'd bit_count on a long,
  *     so the scan prunes most of the corpus before any vector math;
  *     at scale the signature can be a partition/bucket key making
  *     probes near-O(bucket).
  */
object Similarity {

  /** Exact cosine top-k for one query vector. */
  def bruteForceTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int = 10): DataFrame = {
    val q = lit(query.map(_.toDouble))
    df.select(
      col(idCol),
      round(VectorMath.cosineSimilarity(col(vecCol), q), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** LSH-bucketed ANN top-k: score only signature-near vectors.
    * Recall is tunable via `numBits` (fewer bits = bigger buckets)
    * and `maxSigHamming` (multi-probe radius). */
  def lshTopK(df: DataFrame, idCol: String, vecCol: String,
      query: Array[Float], k: Int = 10, numBits: Int = 16,
      maxSigHamming: Int = 4, seed: Long = 42L): DataFrame = {
    val q = lit(query.map(_.toDouble))
    val querySig = signatureOf(query, numBits, seed)
    df.select(col(idCol), col(vecCol),
      Sketches.hyperplaneSignature(col(vecCol), numBits, seed).as("sig"))
      .filter(bit_count(col("sig").bitwiseXOR(lit(querySig))) <= maxSigHamming)
      .select(col(idCol),
        round(VectorMath.cosineSimilarity(col(vecCol), q), 4).as("cosine"))
      .orderBy(col("cosine").desc, col(idCol).asc)
      .limit(k)
  }

  /** Driver-side signature of a query vector — same arithmetic as the
    * HyperplaneSignature expression (kept in lockstep). */
  def signatureOf(vec: Array[Float], numBits: Int, seed: Long): Long = {
    import graft.functions.SketchHash.mix64
    var out = 0L
    var j = 0
    while (j < numBits) {
      var dotv = 0.0
      val planeSeed = mix64(seed + j)
      var d = 0
      while (d < vec.length) {
        val sign = if ((mix64(planeSeed + d) & 1L) == 1L) 1.0 else -1.0
        dotv += vec(d) * sign
        d += 1
      }
      if (dotv >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Per-label centroids of an embedding column: posexplode to
    * (label, dim, value), two-phase avg per (label, dim), regroup into
    * ordered arrays. Shuffle volume = rows × dims scalars — fine for
    * moderate dims; a TypedImperativeAggregate buffer is the upgrade
    * path for very wide vectors. */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    centroidsTyped(df, labelCol, vecCol)

  /** Centroids via the native typed [[graft.functions.VectorAvg]]
    * aggregator: the buffer is one (sums, count) per group per
    * partition, so the shuffle carries |groups| × dims doubles — the
    * scale-correct plan. */
  def centroidsTyped(df: DataFrame, labelCol: String, vecCol: String): DataFrame = {
    val vecAvg = udaf(graft.functions.VectorAvg,
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[Float]]())
    df.groupBy(col(labelCol).as("label"))
      .agg(vecAvg(col(vecCol)).as("raw"))
      .select(col("label"),
        transform(col("raw"), x => round(x, 4)).as("centroid"))
  }

  /** Reference formulation via posexplode + regroup — shuffles
    * |rows| × dims scalars; kept for cross-checking the typed path. */
  def centroidsExploded(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol).as("label"), posexplode(col(vecCol)))
      .groupBy(col("label"), col("pos"))
      .agg(avg(col("col")).as("mean"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"), col("mean")))).as("pairs"))
      .select(col("label"),
        transform(col("pairs"), p => round(p.getField("mean"), 4)).as("centroid"))
}
