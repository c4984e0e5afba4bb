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

  /** An inverted-file index: per-row cluster assignments plus the
    * exact centroids that PRODUCED the assignment — probe ranking and
    * assignment must use the same vectors, or a query's own cluster
    * may not be probed. */
  final case class IvfIndex(
      assignments: DataFrame,
      centroids: Array[Array[Double]],
      idCol: String,
      vecCol: String)

  /** IVF (inverted-file) index: k centroids learned with a fixed
    * number of Lloyd iterations (init = the k lowest-id vectors),
    * every vector assigned to its nearest centroid. Stable given a
    * fixed partitioning; exact boundary ties under float re-summation
    * are the usual k-means caveat.
    *
    * Scale profile: each iteration is one broadcast of k×dims doubles
    * + a map-only argmax pass + a VectorAvg aggregation whose buffer
    * is k×dims — no shuffle ever carries vectors by cluster. The
    * assignments table is what you'd write partitioned by `cluster`
    * so probes prune partitions at read time.
    */
  def ivfIndex(df: DataFrame, idCol: String, vecCol: String,
      k: Int = 16, iters: Int = 3): IvfIndex = {
    // accept array<float|double>: normalize to float once
    val base = df.select(col(idCol).as("id"),
      col(vecCol).cast(org.apache.spark.sql.types.ArrayType(
        org.apache.spark.sql.types.FloatType)).as("vec"))
    var centroids: Array[Array[Double]] = base.orderBy(col("id")).limit(k)
      .collect().map(_.getSeq[Float](1).map(_.toDouble).toArray)
    for (_ <- 0 until iters) {
      val assigned = assignClusters(base, centroids)
      val updated = centroidsTyped(assigned, "cluster", "vec")
        .collect().map(r => r.getInt(0) -> r.getSeq[Double](1).toArray).toMap
      centroids = centroids.indices.map(i => updated.getOrElse(i, centroids(i))).toArray
    }
    val assignments = assignClusters(base, centroids)
      .select(col("id").as(idCol), col("vec").as(vecCol), col("cluster"))
    IvfIndex(assignments, centroids, idCol, vecCol)
  }

  /** ANN top-k over an IVF index: probe the `nprobe` clusters whose
    * (assignment) centroids are closest to the query, exact cosine
    * within them — the tail IS [[bruteForceTopK]] over the probed
    * subset, so nprobe = k degenerates to exact brute force
    * (spec-asserted) and the two paths can't drift apart. */
  def ivfTopK(index: IvfIndex, query: Array[Float],
      topK: Int = 10, nprobe: Int = 4): DataFrame = {
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < math.min(a.length, b.length)) {
        dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i); i += 1
      }
      if (na == 0 || nb == 0) -2.0 else dot / math.sqrt(na * nb)
    }
    val q = query.map(_.toDouble)
    val probes = index.centroids.zipWithIndex
      .sortBy { case (c, _) => -cos(q, c) }
      .take(nprobe).map(_._2).toSeq
    bruteForceTopK(
      index.assignments.filter(col("cluster").isin(probes: _*)),
      index.idCol, index.vecCol, query, topK)
  }

  /** Map-only nearest-centroid assignment: the k centroid literals
    * ride in the plan; argmax via greatest() over (sim, cluster)
    * structs — no join, no shuffle. */
  private def assignClusters(base: DataFrame, centroids: Array[Array[Double]]): DataFrame = {
    if (centroids.length <= 1) {
      // greatest() needs >= 2 args; a 0/1-centroid index is one cluster
      base.select(col("id"), col("vec"), lit(0).as("cluster"))
    } else {
      val scored = centroids.zipWithIndex.map { case (c, i) =>
        struct(
          round(VectorMath.cosineSimilarity(col("vec"), lit(c)), 9).as("sim"),
          lit(i).as("cluster"))
      }
      base
        .withColumn("__vote", greatest(scored.toIndexedSeq: _*))
        .select(col("id"), col("vec"), col("__vote.cluster").as("cluster"))
    }
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
