package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashing primitives shared by the sketch expressions.
  *
  * All hashes are pure JVM arithmetic (no platform-dependent state) so
  * signatures are reproducible across executors, JVMs and re-runs —
  * a hard requirement for dedup at 100 TB where signatures computed in
  * different jobs must still collide identically.
  */
private[graft] object SketchHash {
  /** splitmix64 finalizer — decorrelates seeded streams. */
  def mix64(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** 64-bit content hash of a UTF8 string. */
  def hashUtf8(s: UTF8String, seed: Long): Long = {
    val bytes = s.getBytes
    var h = seed ^ (bytes.length * 0x9e3779b97f4a7c15L)
    var i = 0
    while (i < bytes.length) {
      h = (h ^ bytes(i)) * 0x100000001b3L // FNV-1a style step
      i += 1
    }
    mix64(h)
  }
}

/** Shared codegen for the sketch expressions: the generated code calls
  * the expression's `compute(ArrayData)` directly on the child column
  * value. Unlike `CodegenFallback` — which reconstructs an InternalRow
  * and calls `eval`, and drops the whole stage out of whole-stage
  * codegen — this keeps the surrounding operators fused and passes
  * only the one array the sketch needs. The arithmetic is a single
  * JVM method either way, so interpreted and codegen'd paths are
  * bit-identical by construction. */
private[functions] trait SketchCodegen { self: UnaryExpression =>
  /** The sketch arithmetic; input is the child's ArrayData. */
  def compute(arr: ArrayData): Any

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("sketch", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar => self.dataType match {
      case _: ArrayType =>
        s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
          s" $refName.compute($childVar);"
      case LongType =>
        s"${ev.value} = ((java.lang.Long) $refName.compute($childVar)).longValue();"
      case other =>
        throw new IllegalStateException(s"unsupported sketch output type $other")
    })
  }
}

/** MinHash signature over a set of shingles (array<string> → array<long>).
  *
  * One 64-bit content hash per shingle, then `numHashes` affine
  * transforms (odd multiplier + offset derived from the seed via
  * splitmix64); the signature element i is the minimum transformed
  * value. Estimated Jaccard(a,b) = fraction of equal signature slots.
  *
  * Runs inside a projection — no shuffle, no explode: the O(|shingles|
  * × numHashes) work stays cache-local per row, which is what lets a
  * 100 TB dedup pass scale linearly with input size.
  * (Reference has no sketches; extension surface per BASELINE.json.)
  */
case class MinHashSignature(child: Expression, numHashes: Int, seed: Long)
  extends UnaryExpression with SketchCodegen {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_signature"

  private lazy val multipliers: Array[Long] =
    Array.tabulate(numHashes)(i => SketchHash.mix64(seed + 2L * i) | 1L)
  private lazy val offsets: Array[Long] =
    Array.tabulate(numHashes)(i => SketchHash.mix64(seed + 2L * i + 1L))

  override def compute(arr: ArrayData): Any = {
    // sentinel is unsigned max (-1L): Long.MaxValue sits at the MIDPOINT
    // of the unsigned order used below, which would freeze any slot
    // against transformed hashes with the top bit set
    val sig = Array.fill(numHashes)(-1L)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = SketchHash.hashUtf8(arr.getUTF8String(j), seed)
        var i = 0
        while (i < numHashes) {
          // unsigned comparison keeps the full 64-bit range usable
          val v = multipliers(i) * h + offsets(i)
          if (v + Long.MinValue < sig(i) + Long.MinValue) sig(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** MinHash signature over word n-grams, fused: instead of
  * materializing shingle strings (`transform` + `concat_ws` through
  * the interpreted higher-order-function path — measured ~1 ms/doc),
  * hash each token once and combine consecutive token hashes
  * polynomially into the n-gram hash, then run the affine MinHash
  * transforms. O(tokens × numHashes) arithmetic, zero string
  * allocation — ~10× faster per row, same estimator properties.
  */
case class MinHashNgrams(child: Expression, n: Int, numHashes: Int, seed: Long)
  extends UnaryExpression with SketchCodegen {
  require(n >= 1, "n must be >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "minhash_ngrams"

  private lazy val multipliers: Array[Long] =
    Array.tabulate(numHashes)(i => SketchHash.mix64(seed + 2L * i) | 1L)
  private lazy val offsets: Array[Long] =
    Array.tabulate(numHashes)(i => SketchHash.mix64(seed + 2L * i + 1L))

  override def compute(arr: ArrayData): Any = {
    val len = arr.numElements()
    val tokenHash = new Array[Long](len)
    var i = 0
    while (i < len) {
      tokenHash(i) =
        if (arr.isNullAt(i)) 0L else SketchHash.hashUtf8(arr.getUTF8String(i), seed)
      i += 1
    }
    // sentinel is unsigned max (-1L): Long.MaxValue sits at the MIDPOINT
    // of the unsigned order used below, which would freeze any slot
    // against transformed hashes with the top bit set
    val sig = Array.fill(numHashes)(-1L)
    val nGrams = math.max(1, len - n + 1)
    var g = 0
    while (g < nGrams) {
      // polynomial combine of the n token hashes in the window
      var h = 0x27d4eb2f165667c5L
      var k = g
      val end = math.min(g + n, len)
      while (k < end) {
        h = SketchHash.mix64(h * 0x9E3779B185EBCA87L + tokenHash(k))
        k += 1
      }
      var j = 0
      while (j < numHashes) {
        val v = multipliers(j) * h + offsets(j)
        if (v + Long.MinValue < sig(j) + Long.MinValue) sig(j) = v
        j += 1
      }
      g += 1
    }
    new GenericArrayData(sig)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64-bit SimHash over tokens (array<string> → long): per-token 64-bit
  * hash votes ±1 on each bit position; the sign of each tally is the
  * signature bit. Near-duplicate docs land within a small Hamming
  * distance. Same no-shuffle projection profile as MinHash. */
case class SimHash64(child: Expression, seed: Long)
  extends UnaryExpression with SketchCodegen {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "simhash64"

  override def compute(arr: ArrayData): Any = {
    val tally = new Array[Int](64)
    var j = 0
    while (j < arr.numElements()) {
      if (!arr.isNullAt(j)) {
        val h = SketchHash.hashUtf8(arr.getUTF8String(j), seed)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) tally(b) += 1 else tally(b) -= 1
          b += 1
        }
      }
      j += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (tally(b) > 0) out |= (1L << b)
      b += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Random-hyperplane LSH signature for an embedding
  * (array<float|double> → long bit signature of `numBits` planes).
  * Plane components are Rademacher ±1 derived from (seed, plane, dim)
  * hashes — no stored model, any executor regenerates the same planes.
  * sign(x·r_j) becomes bit j; cosine-similar vectors agree on most
  * bits, so banding the signature buckets near-neighbors together. */
case class HyperplaneSignature(child: Expression, numBits: Int, seed: Long)
  extends UnaryExpression with SketchCodegen {
  require(numBits >= 1 && numBits <= 64, "numBits must be in [1, 64]")
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "hyperplane_signature"

  // resolved once per expression, not per element in the hot loop
  private lazy val elementIsFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType match {
      case FloatType => true
      case DoubleType => false
      case other => throw new IllegalArgumentException(
        s"hyperplane_signature expects array<float|double>, got $other")
    }

  override def compute(arr: ArrayData): Any = {
    val n = arr.numElements()
    val isFloat = elementIsFloat
    var out = 0L
    var j = 0
    while (j < numBits) {
      var dot = 0.0
      var d = 0
      val planeSeed = SketchHash.mix64(seed + j)
      while (d < n) {
        val sign = if ((SketchHash.mix64(planeSeed + d) & 1L) == 1L) 1.0 else -1.0
        val e = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
        dot += e * sign
        d += 1
      }
      if (dot >= 0) out |= (1L << j)
      j += 1
    }
    java.lang.Long.valueOf(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Winnowing document fingerprint (string → array<long>): Rabin-Karp
  * rolling hash over the character stream (k-grams), then the minimum
  * hash of every window of `w` consecutive k-grams, deduplicated —
  * the MOSS scheme. Guarantees any shared substring of length
  * ≥ w + k − 1 contributes at least one common fingerprint, which is
  * what makes it the containment/plagiarism detector (MinHash
  * estimates whole-set resemblance instead). Map-only per row. */
case class WinnowingFingerprint(child: Expression, k: Int, window: Int, seed: Long)
  extends UnaryExpression {
  require(k >= 2 && window >= 1, "need k >= 2 and window >= 1")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "winnowing_fingerprint"

  private val B = 0x100000001b3L // rolling base
  private lazy val Bk: Long = { // B^(k-1) for the leaving character
    var p = 1L; var i = 0
    while (i < k - 1) { p *= B; i += 1 }
    p
  }

  override def nullSafeEval(input: Any): Any =
    computeString(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("sketch", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $refName.computeString($childVar);")
  }

  def computeString(s: UTF8String): ArrayData = {
    val bytes = s.toLowerCase.getBytes
    val n = bytes.length
    if (n < k) return new GenericArrayData(Array(SketchHash.mix64(seed ^ n)))
    // rolling k-gram hashes
    val grams = new Array[Long](n - k + 1)
    var h = 0L
    var i = 0
    while (i < k) { h = h * B + (bytes(i) & 0xFF); i += 1 }
    grams(0) = SketchHash.mix64(h ^ seed)
    i = k
    while (i < n) {
      h = (h - (bytes(i - k) & 0xFF) * Bk) * B + (bytes(i) & 0xFF)
      grams(i - k + 1) = SketchHash.mix64(h ^ seed)
      i += 1
    }
    // winnow: min of each window of `window` gram hashes (rightmost
    // min on ties, per the MOSS paper), deduplicated preserving order
    val out = scala.collection.mutable.ArrayBuffer.empty[Long]
    var last = 0L
    var hasLast = false
    var w0 = 0
    val nWin = math.max(1, grams.length - window + 1)
    while (w0 < nWin) {
      var m = grams(w0)
      var j = w0 + 1
      val end = math.min(w0 + window, grams.length)
      while (j < end) {
        if (grams(j) + Long.MinValue <= m + Long.MinValue) m = grams(j)
        j += 1
      }
      if (!hasLast || m != last) { out += m; last = m; hasLast = true }
      w0 += 1
    }
    new GenericArrayData(out.toArray)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Count-min-sketch point estimate (string → long): probes a
  * serialized [[org.apache.spark.util.sketch.CountMinSketch]] —
  * the merge-able fixed-memory frequency table built by Spark's own
  * `count_min_sketch` aggregate — for the estimated count of the
  * child string. The sketch rides the plan as a task-broadcast
  * constructor field (the Bloom-literal posture of
  * [[graft.ops.Dedup.bloomDecontaminate]]) and deserializes once per
  * executor, lazily. Probes hash the UTF-8 bytes — exactly what the
  * aggregate added (`CountMinSketchAgg` adds string columns as their
  * UTF8String bytes), so estimate(x) ≥ true-count(x) always holds.
  *
  * Codegen: one virtual call on a reference object per row — the
  * surrounding stage stays in whole-stage codegen (same rationale as
  * [[SketchCodegen]]; the probe side of a frequency query is
  * top-k-bounded anyway, never corpus-sized). */
case class CmsEstimate(child: Expression, sketchBytes: Array[Byte])
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cms_estimate"

  // fail at ANALYSIS, not as an executor-side ClassCastException:
  // eval/codegen assume the child produces UTF8String
  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires a string child, got ${child.dataType.catalogString}")
  override protected def withNewChildInternal(newChild: Expression): CmsEstimate =
    copy(child = newChild)

  @transient private lazy val cms =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(sketchBytes))

  def estimate(s: UTF8String): Long = cms.estimateCount(s.getBytes)

  override def nullSafeEval(input: Any): Any =
    estimate(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cms", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = $refName.estimate($childVar);")
  }
}

/** Column-API surface for the sketch expressions (Spark 4 bridges a
  * Catalyst Expression to the public Column via ExpressionUtils). */
object Sketches {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}

  def minhashSignature(shingles: Column, numHashes: Int = 128, seed: Long = 42L): Column =
    column(MinHashSignature(expression(shingles), numHashes, seed))

  def minhashNgrams(tokens: Column, n: Int = 3, numHashes: Int = 128, seed: Long = 42L): Column =
    column(MinHashNgrams(expression(tokens), n, numHashes, seed))

  def simhash64(tokens: Column, seed: Long = 42L): Column =
    column(SimHash64(expression(tokens), seed))

  def hyperplaneSignature(embedding: Column, numBits: Int = 16, seed: Long = 42L): Column =
    column(HyperplaneSignature(expression(embedding), numBits, seed))

  def winnowingFingerprint(text: Column, k: Int = 5, window: Int = 4, seed: Long = 42L): Column =
    column(WinnowingFingerprint(expression(text), k, window, seed))

  def cmsEstimate(item: Column, sketchBytes: Array[Byte]): Column =
    column(CmsEstimate(expression(item), sketchBytes))
}
