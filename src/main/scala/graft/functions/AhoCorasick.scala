package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick automaton (Aho & Corasick 1975) over a fixed pattern
  * list: counts every occurrence of every pattern in a text —
  * overlaps included, multiplicity included — in ONE O(text) pass,
  * independent of pattern count. The classic output function is
  * accumulated through the failure links at build time
  * (`cnt(v) = ends(v) + cnt(fail(v))`), so the scan adds one array
  * read per character instead of walking suffix links per position.
  *
  * Transitions: dense ASCII rows (the regime keyword lists live in)
  * with a hash-map fallback for the rest of the BMP/UTF-16 range;
  * matching is over Java chars, which is exact for any pattern (a
  * supplementary code point is a fixed surrogate pair on both the
  * pattern and text side).
  *
  * Built once per instance and ONCE PER EXECUTOR at evaluation time
  * (the expression ships the pattern list; the automaton itself is
  * `@transient lazy` in [[AhoCorasickCount]]).
  */
final class AhoCorasick(patterns: Seq[String]) extends Serializable {
  require(patterns.nonEmpty, "patterns must be non-empty")
  require(patterns.forall(_.nonEmpty), "patterns must be non-empty strings")

  // --- trie build (growable, then frozen to arrays) ---
  private val asciiRows = new scala.collection.mutable.ArrayBuffer[Array[Int]]()
  private val wideRows =
    new scala.collection.mutable.ArrayBuffer[java.util.HashMap[Character, Integer]]()
  private val endsBuf = new scala.collection.mutable.ArrayBuffer[Int]()

  private def newNode(): Int = {
    val row = new Array[Int](128)
    java.util.Arrays.fill(row, -1)
    asciiRows += row
    wideRows += null
    endsBuf += 0
    asciiRows.length - 1
  }

  private def childOf(s: Int, c: Char): Int =
    if (c < 128) asciiRows(s)(c)
    else {
      val m = wideRows(s)
      if (m == null) -1
      else { val v = m.get(c); if (v == null) -1 else v.intValue() }
    }

  private def link(s: Int, c: Char, v: Int): Unit =
    if (c < 128) asciiRows(s)(c) = v
    else {
      if (wideRows(s) == null) wideRows(s) = new java.util.HashMap[Character, Integer]()
      wideRows(s).put(c, v)
    }

  newNode() // root = 0
  patterns.foreach { p =>
    var s = 0
    var i = 0
    while (i < p.length) {
      val c = p.charAt(i)
      val nxt = childOf(s, c)
      s = if (nxt >= 0) nxt else { val v = newNode(); link(s, c, v); v }
      i += 1
    }
    endsBuf(s) += 1
  }

  private val nNodes = asciiRows.length
  private val fail = new Array[Int](nNodes)
  private val cnt: Array[Int] = endsBuf.toArray
  private val ascii: Array[Array[Int]] = asciiRows.toArray
  private val wide: Array[java.util.HashMap[Character, Integer]] = wideRows.toArray

  // --- BFS failure links + suffix-accumulated counts ---
  locally {
    val q = new java.util.ArrayDeque[Integer]()
    def childrenOf(u: Int): Iterator[(Char, Int)] = {
      val a = ascii(u).iterator.zipWithIndex
        .collect { case (v, c) if v >= 0 => (c.toChar, v) }
      val w = if (wide(u) == null) Iterator.empty
      else {
        import scala.jdk.CollectionConverters._
        wide(u).entrySet().iterator().asScala
          .map(e => (e.getKey.charValue(), e.getValue.intValue()))
      }
      a ++ w
    }
    childrenOf(0).foreach { case (_, v) => fail(v) = 0; q.add(v) }
    while (!q.isEmpty) {
      val u = q.poll().intValue()
      cnt(u) += cnt(fail(u))
      childrenOf(u).foreach { case (c, v) =>
        var f = fail(u)
        var t = childOf(f, c)
        while (f != 0 && t < 0) { f = fail(f); t = childOf(f, c) }
        fail(v) = if (t >= 0 && t != v) t else 0
        q.add(v)
      }
    }
  }

  /** Total pattern occurrences in `s` (overlaps + multiplicity). */
  def countHits(s: String): Int = {
    var st = 0
    var total = 0
    var i = 0
    val n = s.length
    while (i < n) {
      val c = s.charAt(i)
      var t = childOf(st, c)
      while (st != 0 && t < 0) { st = fail(st); t = childOf(st, c) }
      st = if (t >= 0) t else 0
      total += cnt(st)
      i += 1
    }
    total
  }
}

/** `aho_corasick_count(text)`: total occurrences of a literal pattern
  * list in a string column, O(text) per row independent of pattern
  * count — the native upgrade path named by
  * [[graft.ops.TextAnalysis.keywordScreen]]'s scaladoc, whose
  * per-category `array_contains` probe is O(tokens × patterns). The
  * automaton is built from the literal pattern array once per
  * executor (`@transient lazy`); evaluation stays inside whole-stage
  * codegen via the direct-call pattern of [[CdcBoundaries]].
  *
  * For WHOLE-TOKEN semantics (the keywordScreen contract), feed a
  * single-space-joined token stream padded with one leading/trailing
  * space and space-pad every pattern — see
  * [[graft.ops.TextAnalysis.keywordHitsAuto]]. Overlapping matches
  * count once per end position, so consecutive duplicate tokens
  * sharing a delimiter space are each counted. */
case class AhoCorasickCount(child: Expression, patterns: Seq[String])
  extends UnaryExpression {
  require(patterns.nonEmpty, "patterns must be non-empty")

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "aho_corasick_count"

  @transient private lazy val automaton = new AhoCorasick(patterns)

  def count(input: UTF8String): Int = automaton.countHits(input.toString)

  override def nullSafeEval(input: Any): Any =
    count(input.asInstanceOf[UTF8String])

  override def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refName = ctx.addReferenceObj("acc", this, this.getClass.getName)
    nullSafeCodeGen(ctx, ev, childVar =>
      s"${ev.value} = $refName.count($childVar);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
