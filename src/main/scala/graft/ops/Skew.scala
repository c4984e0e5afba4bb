package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for joins — the salting pattern for keys whose
  * frequency distribution would otherwise funnel one join partition
  * through a single task at scale.
  *
  * `saltedEquiJoin(big, small, key, saltFactor)`: the big (skewed)
  * side gets a uniform random-free salt derived from a stable row
  * expression (deterministic — re-runs produce identical plans); the
  * small side is replicated `saltFactor` times so every salted key
  * still finds its match. The join key becomes (key, salt), spreading
  * each hot key over `saltFactor` partitions. Replication multiplies
  * the small side by `saltFactor` — use for dimension-sized right
  * sides (when the small side fits in a broadcast anyway, prefer
  * `broadcast()`; salting is for the mid-size case where neither
  * broadcast nor a plain shuffle behaves).
  *
  * AQE's skew-join handling (`spark.sql.adaptive.skewJoin`) covers
  * moderate skew automatically; explicit salting is the heavy hammer
  * for the single-hot-key regimes (null-heavy foreign keys, celebrity
  * entities) where even split partitions stay hot.
  */
object Skew {

  def saltedEquiJoin(
      big: DataFrame,
      small: DataFrame,
      key: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    require(saltFactor >= 1, "saltFactor must be >= 1")
    // right/full outer would emit one copy of an unmatched small-side
    // row PER SALT REPLICA — silently wrong, so refuse them
    require(Set("inner", "left", "left_outer", "leftouter", "left_semi", "leftsemi",
      "left_anti", "leftanti").contains(joinType.toLowerCase),
      s"saltedEquiJoin replicates the small side; joinType '$joinType' would " +
        "duplicate unmatched small-side rows (use inner/left/semi/anti)")
    // deterministic salt: stable hash of the whole row spread over
    // saltFactor buckets (monotonically_increasing_id would also work
    // but is partition-layout-dependent; xxhash of columns is stable
    // across re-runs and retries)
    val bigSalted = big.withColumn("__salt",
      pmod(xxhash64(big.columns.map(col).toIndexedSeq: _*), lit(saltFactor)).cast("int"))
    val saltValues = (0 until saltFactor).toArray
    val smallReplicated = small
      .withColumn("__salt", explode(lit(saltValues)))
    bigSalted
      .join(smallReplicated, Seq(key, "__salt"), joinType)
      .drop("__salt")
  }
}
