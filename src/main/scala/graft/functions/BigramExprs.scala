package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Per-document hashed char-bigram buckets (string → array<int>):
  * one code-point pass emitting `pmod(cp[k]·31 + cp[k+1], numBuckets)`
  * per adjacent pair, in position order — the native replacement for
  * the exploded-index formulation
  * `bigramBucket(s, i) = pmod(ascii(substr(s,i,1))·31 +
  * ascii(substr(s,i+1,1)), B)`.
  *
  * Why native: `substr(s, i, 1)` on a UTF8String SEEKS — character
  * indexing over a variable-length encoding scans from the start, so
  * evaluating it at every position makes the per-doc cost
  * O(len²/2) (two seeks per position). Profiled r21: the feature
  * builds behind x97/x106/x207/x94 burned 40–55 s CPU at sf0.1 on a
  * few MB of text — almost all of it these seeks. This expression is
  * one O(len) pass.
  *
  * Bit-identical by construction: Spark's `ascii` returns
  * `codePointAt(0)` of the substring's first character and
  * UTF8String "characters" are UTF-8 sequences = code points, so
  * iterating `codePointAt`/`charCount` visits the same values the
  * substr+ascii chain produced; the arithmetic is the same int
  * `·31 + ·` and the same `pmod`. Empty/1-char inputs yield an empty
  * array (both call sites filter `length(s) >= 2` upstream — the old
  * `sequence(1, len-1)` form was UNDEFINED there: Spark infers step
  * -1 for `sequence(1, 0)`). BigramExprSpec pins native == the
  * transform-built substr/ascii form on fixtures and the corpus.
  *
  * Callers must MATERIALIZE the array at an exchange before any
  * explode (the minhashSignatures rule — an expensive expression must
  * never feed a Generate directly). */
case class BigramBuckets(child: Expression, numBuckets: Int)
    extends UnaryExpression {
  require(numBuckets > 0, "numBuckets must be positive")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "bigram_buckets"

  def compute(s: UTF8String): ArrayData = {
    val str = s.toString
    val len = str.length
    if (len == 0) return new GenericArrayData(Array.emptyIntArray)
    var prev = str.codePointAt(0)
    var i = Character.charCount(prev)
    if (i >= len) return new GenericArrayData(Array.emptyIntArray)
    // ≤ len-1 grams; exact count only known after the pass for
    // supplementary chars, so size to the UTF-16 bound and trim
    val out = new Array[Int](len - 1)
    var k = 0
    while (i < len) {
      val cp = str.codePointAt(i)
      i += Character.charCount(cp)
      val v = (prev * 31 + cp) % numBuckets
      out(k) = if (v < 0) v + numBuckets else v
      prev = cp
      k += 1
    }
    new GenericArrayData(if (k == out.length) out
      else java.util.Arrays.copyOf(out, k))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("bigramBuckets", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** Per-document character bigrams (string → array<string>): the
  * substrings `substr(s, i, 2)` for i ∈ 1..max(len−1, 1), in position
  * order — the native replacement for bigramLogProb's exploded-index
  * form, sliced at UTF-8 byte boundaries in one pass (no per-position
  * seek, no decode: only sequence LENGTHS are needed, read off the
  * lead byte).
  *
  * Edge semantics replicated from `explode(sequence(1,
  * greatest(len-1, 1)))` + `substr(i, 2)`: "" → [""], a 1-char doc →
  * [s] (substr clamps past the end), n ≥ 2 → n−1 two-char grams.
  * BigramExprSpec pins native == the transform-built substr form on
  * fixtures and the corpus. Same Generate rule as [[BigramBuckets]]:
  * materialize at an exchange before exploding. */
case class CharBigrams(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "char_bigrams"

  @inline private def seqLen(b: Byte): Int = {
    val u = b & 0xff
    if (u < 0x80) 1 else if (u < 0xe0) 2 else if (u < 0xf0) 3 else 4
  }

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes
    val n = bytes.length
    if (n == 0)
      return new GenericArrayData(Array[Any](UTF8String.EMPTY_UTF8))
    // char-start byte offsets, one pass
    val offs = new Array[Int](n + 1)
    var chars = 0
    var i = 0
    while (i < n) { offs(chars) = i; i += seqLen(bytes(i)); chars += 1 }
    offs(chars) = n
    if (chars < 2)
      return new GenericArrayData(Array[Any](UTF8String.fromBytes(bytes, 0, n)))
    val out = new Array[Any](chars - 1)
    var k = 0
    while (k < chars - 1) {
      val st = offs(k)
      val en = offs(math.min(k + 2, chars))
      out(k) = UTF8String.fromBytes(bytes, st, en - st)
      k += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("charBigrams", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
