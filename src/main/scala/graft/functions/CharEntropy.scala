package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-string Shannon character entropy (string → double): one O(len)
  * pass counting code points, then the x80 sorted fold
  * `−Σ_sorted p·ln(p)` over the distinct-char terms.
  *
  * Native replacement for the higher-order-function formulation
  * (`TextAnalysis.charEntropyFold`): the HOF path evaluates, PER
  * DISTINCT CHAR, an interpreted `filter` over the whole char array
  * with `split(text, "")` re-evaluated twice inside the lambda —
  * O(chars × distinct-chars) interpreted work with a lambda dispatch
  * per comparison (read off the executed plan; ~9–10 s warm CPU at
  * sf0.1, r20 opt). This expression is one tight JVM loop plus a
  * |distinct|-sized sort, and stays inside whole-stage codegen via
  * the direct-call pattern of [[CdcBoundaries]].
  *
  * Bit-identical by construction, term for term:
  *   - element identity: Spark's `split(text, "")` splits at CODE
  *     POINT boundaries with no leading/trailing empties (probed:
  *     "a😀b" → 3 elements, "ab" → 2) — this loop iterates
  *     `codePointAt`/`charCount` over the same code points;
  *   - `p = cast(int as double) / cast(int as double)` is the same
  *     IEEE division, `ln` is the same `java.lang.StrictMath.log` Spark's
  *     `log()` resolves to, `p * ln(p)` the same
  *     multiply;
  *   - `sort_array` ascending over non-NaN doubles is
  *     `java.util.Arrays.sort` order, and the `aggregate(…, 0.0, +)`
  *     left fold is the same `0.0 + t₀ + t₁ + …` chain; the final
  *     `negate` is the same sign flip.
  * CharEntropySpec pins native == HOF on multibyte / repeated /
  * single-char fixtures and the real corpus.
  */
case class CharEntropy(child: Expression) extends UnaryExpression {

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_entropy"

  def compute(s: UTF8String): Double = {
    val str = s.toString
    val counts = new java.util.HashMap[Integer, Array[Int]](64)
    var n = 0
    var i = 0
    while (i < str.length) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      n += 1
      val slot = counts.get(cp)
      if (slot == null) counts.put(cp, Array(1)) else slot(0) += 1
    }
    val terms = new Array[Double](counts.size)
    val it = counts.values().iterator()
    var k = 0
    while (it.hasNext) {
      val p = it.next()(0).toDouble / n.toDouble
      terms(k) = p * java.lang.StrictMath.log(p)
      k += 1
    }
    java.util.Arrays.sort(terms)
    var acc = 0.0
    var j = 0
    while (j < terms.length) { acc = acc + terms(j); j += 1 }
    -acc
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("charEntropy", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = $refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
