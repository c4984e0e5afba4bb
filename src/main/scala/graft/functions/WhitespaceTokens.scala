package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Whitespace tokenization (string → array<string>): one byte-level
  * pass splitting on maximal runs of `[ \t\n\f\r]` — the native
  * replacement for `split(text, TextAnalysis.WhitespaceClass)` behind
  * `TextAnalysis.tokens`, the widest shared text hot path (~30
  * queries tokenize the corpus through it).
  *
  * Why native: Spark's `StringSplit` routes through
  * `UTF8String.split` → `String.split(regex, -1)`, which for a
  * multi-char pattern COMPILES the regex per row, decodes the full
  * UTF8String to a java String, runs a Matcher, and re-encodes every
  * token back to UTF8String. This expression scans the UTF-8 bytes
  * directly (the five class members are ASCII, and multi-byte UTF-8
  * sequences never contain bytes < 0x80, so byte-level splitting is
  * exact) and slices tokens out of one byte array — no regex, no
  * decode, no re-encode. Codegen via the [[CdcBoundaries]]
  * direct-call pattern keeps it inside whole-stage codegen.
  *
  * Bit-identical to `java.util.regex.Pattern.split(s, -1)` on
  * `[ \t\n\f\r]+` — every empty-segment edge replicated (the x198/x40
  * lessons):
  *   - a LEADING separator run yields an empty first token
  *     (" a" → ["", "a"]);
  *   - a TRAILING run yields an empty last token, kept because
  *     Spark's `split` default limit is -1 ("a " → ["a", ""]);
  *   - "" → [""], "  " → ["", ""], interior runs collapse
  *     ("a  b" → ["a", "b"]);
  *   - \x0B (vertical tab) is NOT in the class (the RE2-agreement
  *     pin, CLAUDE.md r10) and stays inside tokens.
  * `TextAnalysis.tokensRegex` keeps the regex formulation as the
  * equality witness; TokenizerSpec pins native == regex on every edge
  * fixture AND the real corpus. */
case class WhitespaceTokens(child: Expression) extends UnaryExpression {

  // matches StringSplit's declared type (split never emits null
  // elements); nullable copied from the child deliberately (r20
  // verdict item 4)
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "ws_tokens"

  @inline private def isWs(b: Byte): Boolean =
    b == 0x20 || b == 0x09 || b == 0x0a || b == 0x0c || b == 0x0d

  def compute(s: UTF8String): ArrayData = {
    val bytes = s.getBytes // one copy when the string is a row-buffer view
    val n = bytes.length
    val out = new java.util.ArrayList[UTF8String](16)
    var start = 0
    var i = 0
    while (i < n) {
      if (isWs(bytes(i))) {
        out.add(UTF8String.fromBytes(bytes, start, i - start))
        i += 1
        while (i < n && isWs(bytes(i))) i += 1
        start = i
      } else i += 1
    }
    out.add(UTF8String.fromBytes(bytes, start, n - start))
    new GenericArrayData(out.toArray.asInstanceOf[Array[Any]])
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("wsTokens", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) " +
        s"$refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
