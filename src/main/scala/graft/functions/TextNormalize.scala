package graft.functions

import java.text.Normalizer

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode normalization (string → string in the given normal form) —
  * the canonicalization step every multilingual text pipeline needs
  * BEFORE hashing/dedup: the same visible text can arrive composed
  * (U+00E1) or decomposed (U+0061 U+0301) and md5/minhash treat them
  * as different documents. Spark ships no normalizer builtin; this is
  * the native-`Expression` tier (SURVEY preference order b) — one
  * `java.text.Normalizer` call per row inside whole-stage codegen via
  * the [[SketchCodegen]] direct-call pattern, no UDF, no serialization.
  *
  * Form semantics follow the Unicode standard exactly, so the result
  * is engine-portable: DuckDB's `nfc_normalize` replays the NFC form
  * bit-for-bit (the x156 oracle hashes both).
  */
case class UnicodeNormalize(child: Expression, form: String)
  extends UnaryExpression {
  require(Set("NFC", "NFD", "NFKC", "NFKD").contains(form),
    s"form must be NFC/NFD/NFKC/NFKD, got $form")

  @transient private lazy val normalForm = Normalizer.Form.valueOf(form)

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "unicode_normalize"

  def compute(s: UTF8String): UTF8String = {
    val str = s.toString
    // fast path: already normalized (true for pure-ASCII) — skip the
    // rebuild and the UTF8String re-encode entirely
    if (Normalizer.isNormalized(str, normalForm)) s
    else UTF8String.fromString(Normalizer.normalize(str, normalForm))
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("norm", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = (org.apache.spark.unsafe.types.UTF8String)" +
        s" $refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** DEFLATE compression ratio (string → double in (0, ~1.1]):
  * `deflate(utf8(text)).length / utf8(text).length` — the
  * Gopher-style redundancy signal (arXiv:2112.11446 quality filters):
  * boilerplate, repeated spans and template spam compress far below
  * natural prose, and the signal is language-agnostic where
  * stopword/entropy features are not. Complements [[graft.ops
  * .TextAnalysis]]'s char-entropy (x80): entropy sees only the
  * symbol DISTRIBUTION, deflate additionally sees SEQUENTIAL
  * structure (LZ77 matches), so `aaabab...` patterns that keep high
  * unigram entropy still flag.
  *
  * Engine-side only: DEFLATE bytes are implementation-defined, so no
  * SQL oracle can replay the ratio — x157 registers rows-only with
  * x80 as its exact hash-green cousin (the twin rule). Within one
  * JVM the ratio is deterministic (fixed level, fixed strategy).
  * Scale shape: one tight per-row loop inside codegen; the Deflater
  * is allocated per call and `end()`ed — no native-memory leak
  * across a 100 TB scan.
  */
case class DeflateRatio(child: Expression, level: Int)
  extends UnaryExpression {
  require(level >= 1 && level <= 9, s"level must be in [1,9], got $level")

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "deflate_ratio"

  def compute(s: UTF8String): Double = {
    val raw = s.getBytes
    if (raw.length == 0) return 1.0
    val d = new java.util.zip.Deflater(level, true)
    try {
      d.setInput(raw)
      d.finish()
      val buf = new Array[Byte](8192)
      var compressed = 0L
      while (!d.finished()) compressed += d.deflate(buf)
      compressed.toDouble / raw.length
    } finally d.end()
  }

  override def nullSafeEval(input: Any): Any =
    compute(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("deflate", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = $refName.compute($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextNormalize {
  import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
  import org.apache.spark.sql.Column

  def unicodeNormalize(text: Column, form: String = "NFC"): Column =
    column(UnicodeNormalize(expression(text), form))

  def deflateRatio(text: Column, level: Int = 6): Column =
    column(DeflateRatio(expression(text), level))
}
