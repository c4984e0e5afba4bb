package graft.ops

import graft.functions.{Sketches, VectorMath}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Deduplication operators for an LLM training-data pipeline, each
  * designed around its 100 TB shuffle profile:
  *
  *   - exact: hash-groupBy on a content digest — one shuffle keyed by
  *     a 128-bit hash (uniform, no skew), map-side partial dedup;
  *   - MinHash+LSH: signatures in a map-only projection, then a
  *     shuffle per *band* keyed by (band, slice-hash). Candidate pairs
  *     only ever materialize within a bucket, so the quadratic blowup
  *     is bounded by bucket size, never by corpus size;
  *   - SimHash: one 64-bit signature, banded into 16-bit chunks —
  *     same bounded-bucket join, cheaper signatures, catches
  *     small-edit near-dups;
  *   - n-gram Jaccard: exact verification, run only on LSH candidate
  *     pairs (never all-pairs);
  *   - embedding cosine: hyperplane-LSH buckets then exact cosine on
  *     candidates.
  */
object Dedup {

  /** Exact dedup: groups rows by content digest, keeps the smallest id
    * as canonical. Output: one row per distinct content with its
    * keeper id and multiplicity. */
  def exact(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(md5(col(textCol)).as("content_hash"))
      .agg(min(col(idCol)).as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Exact dedup, keep-first semantics: the deduplicated dataset
    * itself (smallest id per distinct content survives). */
  def exactKeepFirst(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(md5(col(textCol))).orderBy(col(idCol))
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** MinHash+LSH candidate pairs: shingle → minhash signature →
    * band → bucket-join. Returns (id_a, id_b, est_jaccard) for pairs
    * sharing ≥1 band bucket, with the signature-estimated Jaccard.
    *
    * numHashes = bands × rowsPerBand; the (bands, rowsPerBand) pair
    * sets the S-curve threshold ≈ (1/bands)^(1/rowsPerBand).
    */
  def minhashCandidates(df: DataFrame, idCol: String, textCol: String,
      numHashes: Int = 128, bands: Int = 32, shingleSize: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val rowsPerBand = numHashes / bands
    val sig = df.select(
      col(idCol).as("id"),
      Sketches.minhashSignature(
        TextAnalysis.wordNgrams(col(textCol), shingleSize), numHashes).as("sig"))
    // band b = hash of signature slots [b*r, (b+1)*r) — posexplode to
    // (id, band, bucket) then self-join per (band, bucket)
    val bandExprs = (0 until bands).map(b =>
      xxhash64(lit(b), slice(col("sig"), b * rowsPerBand + 1, rowsPerBand)))
    val banded = sig.select(
      col("id"), col("sig"),
      posexplode(array(bandExprs: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val a = banded.select(col("band"), col("bucket"),
      col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("bucket"),
      col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b"))
      .distinct() // a pair may collide in several bands
      .withColumn("est_jaccard",
        round(aggregate(
          zip_with(col("sig_a"), col("sig_b"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / numHashes, 4))
      .drop("sig_a", "sig_b")
  }

  /** MinHash near-duplicates: candidates whose estimated Jaccard
    * clears the threshold. */
  def minhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.8, numHashes: Int = 128, bands: Int = 32,
      shingleSize: Int = 3): DataFrame =
    minhashCandidates(df, idCol, textCol, numHashes, bands, shingleSize)
      .filter(col("est_jaccard") >= threshold)

  /** SimHash near-duplicates: 64-bit signature, banded into four
    * 16-bit chunks (pigeonhole: hamming ≤ 3 ⇒ at least one chunk
    * equal), exact hamming check on candidates. */
  def simhashNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      maxHamming: Int = 3): DataFrame = {
    val sig = df.select(col(idCol).as("id"),
      Sketches.simhash64(TextAnalysis.tokens(col(textCol))).as("sig"))
    val chunkExprs = (0 until 4).map(b =>
      shiftright(col("sig"), b * 16).bitwiseAND(lit(0xFFFFL)))
    val banded = sig.select(col("id"), col("sig"),
      posexplode(array(chunkExprs: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("sig").as("sig_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("sig").as("sig_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("sig_a"), col("sig_b")).distinct()
      .withColumn("hamming", bit_count(col("sig_a").bitwiseXOR(col("sig_b"))))
      .filter(col("hamming") <= maxHamming)
      .select(col("id_a"), col("id_b"), col("hamming"))
  }

  /** Exact n-gram Jaccard, verified on MinHash-LSH candidates only —
    * the scale-safe way to get exact similarities: the all-pairs
    * quadratic never happens. */
  def ngramJaccardNearDuplicates(df: DataFrame, idCol: String, textCol: String,
      threshold: Double = 0.7, shingleSize: Int = 3): DataFrame = {
    val cands = minhashCandidates(df, idCol, textCol, shingleSize = shingleSize)
      .select("id_a", "id_b")
    val grams = df.select(col(idCol).as("gid"),
      array_distinct(TextAnalysis.wordNgrams(col(textCol), shingleSize)).as("grams"))
    cands
      .join(grams.withColumnRenamed("gid", "id_a").withColumnRenamed("grams", "grams_a"), "id_a")
      .join(grams.withColumnRenamed("gid", "id_b").withColumnRenamed("grams", "grams_b"), "id_b")
      .withColumn("inter", size(array_intersect(col("grams_a"), col("grams_b"))))
      .withColumn("uni", size(array_union(col("grams_a"), col("grams_b"))))
      .withColumn("jaccard",
        round(when(col("uni") > 0, col("inter").cast("double") / col("uni")).otherwise(0.0), 4))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** Embedding-cosine near-duplicates: hyperplane-LSH buckets bound
    * the candidate set, exact cosine verifies. Multi-probe via
    * `bands` signature splits keeps recall high. */
  def embeddingNearDuplicates(df: DataFrame, idCol: String, vecCol: String,
      threshold: Double = 0.95, numBits: Int = 16, bands: Int = 4): DataFrame = {
    require(numBits % bands == 0, "bands must divide numBits")
    val bitsPerBand = numBits / bands
    val mask = (1L << bitsPerBand) - 1
    val sig = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
      Sketches.hyperplaneSignature(col(vecCol), numBits).as("sig"))
    val chunkExprs = (0 until bands).map(b =>
      shiftright(col("sig"), b * bitsPerBand).bitwiseAND(lit(mask)))
    val banded = sig.select(col("id"), col("vec"),
      posexplode(array(chunkExprs: _*)))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "chunk")
    val a = banded.select(col("band"), col("chunk"), col("id").as("id_a"), col("vec").as("vec_a"))
    val b = banded.select(col("band"), col("chunk"), col("id").as("id_b"), col("vec").as("vec_b"))
    a.join(b, Seq("band", "chunk"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), col("vec_a"), col("vec_b")).distinct()
      .withColumn("cosine", round(VectorMath.cosineSimilarity(col("vec_a"), col("vec_b")), 4))
      .filter(col("cosine") >= threshold)
      .select("id_a", "id_b", "cosine")
  }
}
