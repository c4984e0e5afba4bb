package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Post-saturation bounds probe (r14 verdict #4, extended r15): the
  * AutoBits regime past the historical Long-saturation expiry,
  * measured with DETERMINISTIC pair bounds instead of CPU cells
  * (heavy-shuffle CPU carries ±2-3× same-VM variance — the PERF.md
  * honesty note demonstrates it twice).
  *
  * Through r14, `lshBitsFor` stopped growing the bucket space at
  * bitsPerBand = 64/bands (one Long): 4 bands saturated at 16-bit
  * chunks ≈ a 6.5M-vector corpus, beyond which only the `maxBucket`
  * cap bounded in-bucket work (the archived r15 "saturated" rows
  * measured exactly that regime). r15 implements the composition
  * past the Long — WIDE per-band signatures
  * ([[graft.ops.Dedup.lshSignature]]) — and this probe now emits the
  * auto (wide) and saturated forms SIDE BY SIDE on the same corpus,
  * so the sizing defense's return is a measured delta, not a claim.
  * The probe builds synthetic vectors-only corpora ABOVE the
  * historical expiry (default 8M and 16M × 32 dims — no text
  * columns, so 16M rows fit a few GiB) and emits per corpus, per
  * banding variant:
  *
  *  - `pairs_uncapped`: Σ C(bucket, 2) — candidate pairs a capless
  *    banding would emit (the quadratic);
  *  - `pairs_capped`: Σ [bucket ≤ cap → C(bucket,2); else bucket−1] —
  *    EXACTLY the candidate rows [[graft.ops.Dedup.cappedBucketPairs]]
  *    generates (star pairing emits bucket−1 rows), i.e. the realized
  *    verification workload;
  *  - bucket-space occupancy (buckets, capped buckets, max bucket).
  *
  * Pure counts over one aggregation of the banded signature — no pair
  * table ever materializes, so the probe itself is safe at any corpus.
  * ≤-linear verdict: pairs_capped at 16M vs 8M should scale ≈ ×2
  * (the cap holds realized pairs ∝ n) while pairs_uncapped scales ≈ ×4
  * on the clustered mass (the resumed quadratic the cap absorbs).
  *
  * The corpus is 30% clustered (200 hot centers, ±1% noise — hot
  * signature buckets ≫ the cap, the skew regime dedup actually
  * targets) and 70% hash-random (the sparse background). All values
  * derive from xxhash64(id, dim) — deterministic, replayable, no RNG.
  *
  * Usage: sbt "runMain graft.SaturationProbe [n ...]"
  *   (default: 8000000 16000000)
  * Output: one JSON line per (n, banding) on stdout; archive at
  * SPARK_GRAFT_SATPROBE_OUT (default /tmp/graft_saturation_probe.json).
  */
object SaturationProbe {

  /** Deterministic vectors-only corpus: 30% of rows draw one of 200
    * hot centers (coordinates from xxhash64(center, dim)) plus ±1%
    * per-dim noise; the rest are per-row hash-random. Everything is
    * integer-hash arithmetic — two runs produce identical corpora. */
  def syntheticVectors(spark: SparkSession, n: Long, dims: Int = 32,
      hotCenters: Int = 200): DataFrame = {
    val id = col("id")
    val isHot = pmod(xxhash64(id, lit(7)), lit(10)) < 3
    val center = pmod(xxhash64(id, lit(11)), lit(hotCenters))
    val vec = transform(sequence(lit(0), lit(dims - 1)), d => {
      val hot = (pmod(xxhash64(center, d, lit(3)), lit(2001)) - 1000) / lit(1000.0)
      val noise = (pmod(xxhash64(id, d, lit(13)), lit(101)) - 50) / lit(5000.0)
      val rnd = (pmod(xxhash64(id, d, lit(17)), lit(2001)) - 1000) / lit(1000.0)
      when(isHot, hot + noise).otherwise(rnd).cast("float")
    })
    spark.range(0L, n, 1L, 64).select(id.as("vec_id"), vec.as("embedding"))
  }

  /** One aggregation pass: bucket-size stats and both pair bounds for
    * a banding over the corpus — the [[graft.ScaleProbe]] pairBound
    * shape extended with the capped (= realized) form. Regime-aware
    * via the shared helpers: widths ≤ 64 band the packed Long
    * bit-slices (the historical saturated form), wider widths band
    * per-band signatures ([[graft.ops.Dedup.lshSignature]]'s WIDE
    * regime) — so the probe can put the two regimes side by side on
    * the same corpus. */
  def bandingBounds(df: DataFrame, numBits: Int, bands: Int,
      cap: Int): (Long, Long, Long, Long, Long) = {
    val sig = df.select(col("vec_id").as("id"),
      graft.ops.Dedup.lshSignature(col("embedding"), numBits, bands)
        .as("sig"))
    val row = graft.ops.Dedup.lshBandChunks(sig, numBits, bands)
      .groupBy("band", "chunk").agg(count(lit(1)).as("n"))
      .agg(
        sum(expr("n * (n - 1) DIV 2")).as("uncapped"),
        sum(expr(s"CASE WHEN n <= $cap THEN n * (n - 1) DIV 2 ELSE n - 1 END"))
          .as("capped"),
        count(lit(1)).as("buckets"),
        sum(expr(s"CASE WHEN n > $cap THEN 1 ELSE 0 END")).as("n_capped"),
        max(col("n")).as("max_bucket"))
      .collect()(0)
    (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3),
      row.getLong(4))
  }

  def main(args: Array[String]): Unit = {
    val sizes: Seq[Long] =
      if (args.nonEmpty) args.toSeq.map(_.toLong)
      else Seq(8000000L, 16000000L)
    val cap = graft.ops.Dedup.DefaultMaxBucket
    val spark = Bench.buildSession()
    spark.sparkContext.setLogLevel("WARN")
    val sb = new StringBuilder
    sizes.foreach { n =>
      val vecs = syntheticVectors(spark, n)
        .persist(org.apache.spark.storage.StorageLevel.DISK_ONLY)
      try {
        // per banding: the AutoBits production resolution (r15: WIDE
        // past one Long — bucket space keeps growing) next to the
        // r14 SATURATED form (width clamped at 64, the regime whose
        // quadratic resumption the archived r15 rows measured) — the
        // side-by-side that shows what the wide composition buys
        val variants = Seq(4, 8).flatMap { bands =>
          val auto = graft.ops.Dedup.lshBitsFor(n, bands)
          val saturated =
            math.min(64, bands * math.min(auto / bands, 64 / bands))
          Seq((auto, bands, "auto")) ++
            (if (saturated != auto) Seq((saturated, bands, "saturated"))
             else Nil)
        }
        variants.foreach { case (bits, bands, regime) =>
          val t0 = System.nanoTime()
          val (unc, capd, buckets, nCapped, maxB) =
            bandingBounds(vecs, bits, bands, cap)
          val wall = (System.nanoTime() - t0) / 1e9
          val line =
            f"""{"n":$n,"bands":$bands,"bits":$bits,"regime":"$regime",""" +
              f""""cap":$cap,"pairs_uncapped":$unc,"pairs_capped":$capd,""" +
              f""""buckets":$buckets,"capped_buckets":$nCapped,""" +
              f""""max_bucket":$maxB,"wall":$wall%.1f}"""
          println(line); sb.append(line).append('\n')
          System.err.println(f"[satprobe] n=$n%9d bands=$bands bits=$bits " +
            f"($regime%s) uncapped=$unc%15d capped=$capd%13d " +
            f"capped_buckets=$nCapped%6d/$buckets max=$maxB wall=$wall%6.1f")
        }
      } finally vecs.unpersist(blocking = true)
    }
    val out = sys.env.getOrElse("SPARK_GRAFT_SATPROBE_OUT",
      "/tmp/graft_saturation_probe.json")
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    System.err.println(s"[satprobe] archived to $out")
    spark.stop()
  }
}
