package graft

import graft.functions.{CosineSimilarityExpr, HyperplaneSignature, MinHashNgrams, MinHashSignature, SimHash64}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

/** SQL surface for graft's native expressions.
  *
  * Two registration paths, same functions:
  *   - `withExtensions(new GraftExtensions)` at session build
  *     (`spark.sql.extensions=graft.GraftExtensions` on a cluster);
  *   - [[GraftFunctions.register]] on a live session.
  *
  * After either, plain SQL can use the sketches:
  * {{{
  *   SELECT minhash_ngrams(split(lower(text), '\\s+'), 3, 128, 42) FROM docs
  *   SELECT simhash64(split(lower(text), '\\s+'), 42) FROM docs
  *   SELECT hyperplane_sig(embedding, 16, 42) FROM embeddings
  *   SELECT aho_corasick_count(text, 'spark', 'stream') FROM docs
  * }}}
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit =
    GraftFunctions.descriptors.foreach { case (name, info, builder) =>
      ext.injectFunction((FunctionIdentifier(name), info, builder))
    }
}

object GraftFunctions {

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }
  private def longArg(e: Expression, what: String): Long = e match {
    case Literal(v: Int, _) => v.toLong
    case Literal(v: Long, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be a long literal, got $other")
  }
  private def strArg(e: Expression, what: String): String = e match {
    case Literal(v: org.apache.spark.unsafe.types.UTF8String, _) if v != null =>
      v.toString
    case other => throw new IllegalArgumentException(
      s"$what must be a string literal, got $other")
  }

  /** (name, info, builder) triples for every SQL-exposed function. */
  val descriptors: Seq[(String, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    ("minhash_ngrams",
      new ExpressionInfo(classOf[MinHashNgrams].getName, "minhash_ngrams"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => MinHashNgrams(tokens, 3, 128, 42L)
        case Seq(tokens, n) => MinHashNgrams(tokens, intArg(n, "n"), 128, 42L)
        case Seq(tokens, n, k) => MinHashNgrams(tokens, intArg(n, "n"), intArg(k, "numHashes"), 42L)
        case Seq(tokens, n, k, seed) =>
          MinHashNgrams(tokens, intArg(n, "n"), intArg(k, "numHashes"), longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException(
          "minhash_ngrams(tokens[, n[, numHashes[, seed]]])")
      }),
    ("minhash_signature",
      new ExpressionInfo(classOf[MinHashSignature].getName, "minhash_signature"),
      (args: Seq[Expression]) => args match {
        case Seq(shingles) => MinHashSignature(shingles, 128, 42L)
        case Seq(shingles, k) => MinHashSignature(shingles, intArg(k, "numHashes"), 42L)
        case Seq(shingles, k, seed) =>
          MinHashSignature(shingles, intArg(k, "numHashes"), longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException(
          "minhash_signature(shingles[, numHashes[, seed]])")
      }),
    ("simhash64",
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (args: Seq[Expression]) => args match {
        case Seq(tokens) => SimHash64(tokens, 42L)
        case Seq(tokens, seed) => SimHash64(tokens, longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException("simhash64(tokens[, seed])")
      }),
    ("hyperplane_sig",
      new ExpressionInfo(classOf[HyperplaneSignature].getName, "hyperplane_sig"),
      (args: Seq[Expression]) => args match {
        case Seq(vec) => HyperplaneSignature(vec, 16, 42L)
        case Seq(vec, bits) => HyperplaneSignature(vec, intArg(bits, "numBits"), 42L)
        case Seq(vec, bits, seed) =>
          HyperplaneSignature(vec, intArg(bits, "numBits"), longArg(seed, "seed"))
        case _ => throw new IllegalArgumentException("hyperplane_sig(vec[, numBits[, seed]])")
      }),
    ("cosine_similarity",
      new ExpressionInfo(classOf[CosineSimilarityExpr].getName, "cosine_similarity"),
      (args: Seq[Expression]) => args match {
        case Seq(a, b) => CosineSimilarityExpr(a, b)
        case _ => throw new IllegalArgumentException("cosine_similarity(vecA, vecB)")
      }),
    ("cdc_boundaries",
      new ExpressionInfo(classOf[graft.functions.CdcBoundaries].getName,
        "cdc_boundaries"),
      (args: Seq[Expression]) => args match {
        case Seq(text) => graft.functions.CdcBoundaries(text, 8, 16)
        case Seq(text, w) =>
          graft.functions.CdcBoundaries(text, intArg(w, "window"), 16)
        case Seq(text, w, m) =>
          graft.functions.CdcBoundaries(text, intArg(w, "window"), intArg(m, "mod"))
        case _ => throw new IllegalArgumentException(
          "cdc_boundaries(text[, window[, mod]])")
      }),
    ("aho_corasick_count",
      new ExpressionInfo(classOf[graft.functions.AhoCorasickCount].getName,
        "aho_corasick_count"),
      // patterns are raw substrings — NO token padding: SQL callers
      // choose their own boundary convention (pad with spaces for the
      // keywordHitsAuto whole-token semantics). The pattern list must
      // be literal: the automaton compiles once per plan.
      (args: Seq[Expression]) => args match {
        case text +: pats if pats.nonEmpty =>
          val ps = pats.map(p => strArg(p, "pattern")).distinct
          // fail at PLAN time, not first task eval: the automaton's
          // own nonEmpty require only fires when the @transient lazy
          // build is forced inside an executor
          if (ps.exists(_.isEmpty)) throw new IllegalArgumentException(
            "aho_corasick_count patterns must be non-empty strings")
          graft.functions.AhoCorasickCount(text, ps)
        case _ => throw new IllegalArgumentException(
          "aho_corasick_count(text, pattern[, pattern...])")
      }),
    ("scrub_pii",
      new ExpressionInfo(
        classOf[org.apache.spark.sql.catalyst.expressions.RegExpReplace].getName,
        "scrub_pii"),
      (args: Seq[Expression]) => args match {
        // the same nested replace chain as TextAnalysis.scrubPii,
        // built from the shared pattern constants (lockstep by
        // construction) — plain codegen'd RegExpReplace nodes
        case Seq(text) =>
          import org.apache.spark.sql.catalyst.expressions.RegExpReplace
          def rr(e: Expression, pat: String, tag: String): Expression =
            RegExpReplace(e, Literal(pat), Literal(tag))
          rr(rr(rr(text,
            graft.ops.TextAnalysis.PiiEmailPattern, "<EMAIL>"),
            graft.ops.TextAnalysis.PiiIpPattern, "<IP>"),
            graft.ops.TextAnalysis.PiiPhonePattern, "<PHONE>")
        case _ => throw new IllegalArgumentException("scrub_pii(text)")
      }))

  /** Register on an already-built session (temp functions). */
  def register(spark: SparkSession): Unit = {
    val registry: FunctionRegistry = spark.sessionState.functionRegistry
    descriptors.foreach { case (name, info, builder) =>
      registry.registerFunction(FunctionIdentifier(name), info, builder)
    }
  }
}
