package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Content-defined chunk boundaries (string → array<int> of 1-based
  * cut positions, final position always included): a cut falls after
  * every position whose trailing `window`-codepoint base-31 polynomial
  * hash is ≡ 0 (mod `mod`).
  *
  * Native replacement for the higher-order-function formulation in
  * [[graft.ops.Dedup.cdcChunks]]: the HOF path re-hashes the full
  * window at every position (O(len·window) with a lambda-call
  * allocation per step — measured ~21 s CPU over sf0.1); this
  * expression keeps a TRUE rolling hash (`h ← (h − out·31^(w−1))·31 +
  * in`, O(1) per position, one tight JVM loop, zero allocation) and
  * stays inside whole-stage codegen via the direct-call pattern of
  * [[SketchCodegen]]. Bit-identical by construction: both compute the
  * same polynomial over the same code points (`ascii(substr(i,1))`
  * semantics), exact in Long (max ≈ 1.7e15).
  */
case class CdcBoundaries(child: Expression, window: Int, mod: Int)
  extends UnaryExpression {
  require(window >= 2 && window <= 16, "window must be in [2,16]")
  require(mod >= 2, "mod must be >= 2")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "cdc_boundaries"

  // 31^(window-1). The full window hash max(cp)·(31^w − 1)/30 stays
  // exact in Long only for w ≤ 12 on ASCII/Latin-1 (255·(31^12−1)/30
  // ≈ 6.7e18 < 2^63), w ≤ 10 on BMP (≈ 1.8e18) and w ≤ 9 on full
  // Unicode (0x10FFFF·(31^9−1)/30 ≈ 9.8e17) — beyond that both the
  // window hash and the rolling update wrap mod 2^64. Wrapped values
  // are still DETERMINISTIC (the HOF formulation wraps identically),
  // but an exact-arithmetic oracle replay agrees only when `mod` is
  // a power of two (wrap mod 2^64 commutes with mod 2^k) — enforced
  // at the operator layer (Dedup.requireAnchorParams).
  private val topPower: Long = {
    var p = 1L; var i = 1
    while (i < window) { p *= 31L; i += 1 }
    p
  }

  def compute(s: UTF8String): GenericArrayData = {
    val str = s.toString
    val cps = str.codePoints().toArray
    val n = cps.length
    val cuts = new java.util.ArrayList[Integer](math.max(4, n / mod))
    if (n >= window) {
      var h = 0L
      var i = 0
      while (i < window) { h = h * 31L + cps(i); i += 1 }
      if (h % mod == 0) cuts.add(window)
      // i is the 0-based index of the next char entering the window
      while (i < n) {
        h = (h - cps(i - window) * topPower) * 31L + cps(i)
        i += 1
        if (h % mod == 0) cuts.add(i)
      }
    }
    if (cuts.isEmpty || cuts.get(cuts.size - 1) != n) cuts.add(n)
    val out = new Array[Int](cuts.size)
    var k = 0
    while (k < out.length) { out(k) = cuts.get(k); k += 1 }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("cdc", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData)" +
        s" $refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
