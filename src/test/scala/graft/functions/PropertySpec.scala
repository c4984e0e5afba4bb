package graft.functions

import graft.SparkTestSession
import graft.ops.TextAnalysis
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

/** Property-based checks for the estimator/expression paths the
  * DuckDB oracle can NOT verify (sketch outputs are engine-defined,
  * so their driver checks are rows-only): randomized inputs with a
  * FIXED seed, so failures reproduce.
  *
  * Why these specific properties: a sketch bug that biases estimates
  * (like round 1's MinHash sentinel-ordering bug) passes every
  * rows-only driver check and every hand-picked example — only a
  * distributional property over many random inputs catches it.
  */
class PropertySpec extends AnyFunSuite {
  import SparkTestSession.spark
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    Iterator.from(0).map(i => g.apply(Gen.Parameters.default, Seed(42L + i)))
      .collect { case Some(a) => a }.take(n).toSeq

  test("native cosine expression is bit-identical to the HOF formulation") {
    val vecPair = for {
      n <- Gen.choose(1, 48)
      a <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
      b <- Gen.listOfN(n, Gen.choose(-10.0f, 10.0f))
    } yield (a.toArray, b.toArray)
    val pairs = samples(vecPair, 200)
    val df = pairs.toDF("a", "b")
    // the HOF fold the native expression replaced — same sequential
    // double arithmetic, element by element
    def hofDot(x: org.apache.spark.sql.Column, y: org.apache.spark.sql.Column) =
      aggregate(zip_with(x.cast("array<double>"), y.cast("array<double>"),
        (p, q) => p * q), lit(0.0), (acc, v) => acc + v)
    def hofNorm(x: org.apache.spark.sql.Column) =
      sqrt(aggregate(transform(x.cast("array<double>"), v => v * v),
        lit(0.0), (acc, v) => acc + v))
    val out = df.select(
      VectorMath.cosineSimilarity(col("a"), col("b")).as("native"),
      (hofDot(col("a"), col("b")) / (hofNorm(col("a")) * hofNorm(col("b")))).as("hof"))
      .collect()
    out.foreach { r =>
      val n = r.getDouble(0); val h = r.getDouble(1)
      // bit-identical, not approximately equal (NaN == NaN via bits)
      assert(java.lang.Double.doubleToLongBits(n) == java.lang.Double.doubleToLongBits(h),
        s"native $n != hof $h")
    }
  }

  test("minhash estimate tracks exact jaccard within sketch error") {
    // random token sets with forced overlap levels; 128 hashes ->
    // standard error ~= sqrt(j(1-j)/128) <= 0.045, assert 4 sigma
    val vocab = (0 until 60).map(i => s"tok$i")
    val setPair = for {
      na <- Gen.choose(8, 30)
      nb <- Gen.choose(8, 30)
      a <- Gen.pick(na, vocab)
      b <- Gen.pick(nb, vocab)
    } yield (a.toSeq, b.toSeq)
    val pairs = samples(setPair, 60)
    val df = pairs.zipWithIndex
      .map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "ta", "tb")
    val got = df.select(
      col("id"),
      Sketches.minhashSignature(col("ta")).as("sa"),
      Sketches.minhashSignature(col("tb")).as("sb"),
      (size(array_intersect(col("ta"), col("tb"))).cast("double") /
        size(array_union(col("ta"), col("tb")))).as("jaccard"))
      .withColumn("est",
        aggregate(zip_with(col("sa"), col("sb"), (x, y) => when(x === y, 1).otherwise(0)),
          lit(0), (acc, x) => acc + x).cast("double") / 128)
      .select("id", "jaccard", "est")
      .collect()
    got.foreach { r =>
      val j = r.getDouble(1); val e = r.getDouble(2)
      assert(math.abs(j - e) <= 0.18, s"pair ${r.getLong(0)}: jaccard $j est $e")
    }
    // and the estimator is unbiased in aggregate, not just bounded
    val meanErr = got.map(r => r.getDouble(2) - r.getDouble(1)).sum / got.length
    assert(math.abs(meanErr) <= 0.02, s"systematic bias $meanErr")
  }

  test("simhash near-duplicates have closer signatures than unrelated pairs") {
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    val vocab = (0 until 200).map(i => s"w$i")
    val gen = for {
      base <- Gen.pick(25, vocab)
      flip <- Gen.pick(2, base) // near-dup: drop 2 of 25 tokens
      other <- Gen.pick(25, vocab)
    } yield (base.toSeq, base.toSeq.diff(flip.toSeq), other.toSeq)
    val triples = samples(gen, 40)
    val df = triples.zipWithIndex.map { case ((b, n, o), i) => (i.toLong, b, n, o) }
      .toDF("id", "base", "near", "other")
    val sigs = df.select(
      Sketches.simhash64(col("base")).as("sb"),
      Sketches.simhash64(col("near")).as("sn"),
      Sketches.simhash64(col("other")).as("so"))
      .collect()
    // on average the 2-token edit moves far fewer bits than a resample;
    // individual ties can happen, so assert the aggregate separation
    val nearMean = sigs.map(r => hamming(r.getLong(0), r.getLong(1))).sum.toDouble / sigs.length
    val otherMean = sigs.map(r => hamming(r.getLong(0), r.getLong(2))).sum.toDouble / sigs.length
    assert(nearMean + 8 < otherMean, s"near $nearMean vs other $otherMean")
  }

  test("anchor window profile matches a brute-force reference on random corpora") {
    // x197's correctness otherwise rests on the DuckDB oracle plus one
    // planted fixture — this drives the whole operator (rolling-hash
    // anchors, window fit, first-occurrence total order, majority
    // flag) against an independent sequential implementation on
    // randomized corpora with planted cross-doc duplication
    val n = 20; val window = 8; val mod = 8
    def refAnchors(s: String): Seq[Int] =
      if (s.length < window) Seq.empty
      else (window to s.length).filter { i =>
        val h = (i - window until i)
          .foldLeft(0L)((acc, j) => acc * 31L + s.charAt(j).toLong)
        h % mod == 0
      }
    def refProfile(docs: Seq[(Long, String)]): Map[Long, (Long, Long, Int)] = {
      val wins = for {
        (id, s) <- docs if s.nonEmpty
        pos <- refAnchors(s) if pos + n <= s.length
      } yield (id, pos, s.substring(pos, pos + n))
      val winner = wins.groupBy(_._3)
        .map { case (seg, rows) => seg -> rows.map(r => (r._1, r._2)).min }
      wins.groupBy(_._1).map { case (id, rows) =>
        val nW = rows.size.toLong
        val nDup = rows.count { case (i, p, seg) => winner(seg) != ((i, p)) }.toLong
        id -> ((nW, nDup, if (nDup * 2 > nW) 1 else 0))
      }
    }
    // small alphabet -> anchors and genuine window collisions are
    // frequent; half the docs splice a run copied from another doc
    val alphabet = Gen.oneOf('a', 'b', 'c', 'd', ' ')
    val corpusGen = for {
      k <- Gen.choose(8, 20)
      base <- Gen.listOfN(k, for {
        len <- Gen.choose(0, 240)
        cs <- Gen.listOfN(len, alphabet)
      } yield cs.mkString)
      splices <- Gen.listOfN(k, Gen.choose(0, 1000))
    } yield base.zipWithIndex.map { case (s, i) =>
      val donor = base((i + 1) % k)
      val text =
        if (i % 2 == 1 && donor.length > 80)
          s.take(splices(i) % (s.length + 1)) + donor.substring(10, 80) +
            s.drop(splices(i) % (s.length + 1))
        else s
      (i.toLong, text)
    }
    samples(corpusGen, 6).zipWithIndex.foreach { case (docs, si) =>
      val got = graft.ops.Dedup.anchorWindowProfile(
        docs.toDF("doc_id", "text"), "doc_id", "text", n, window, mod)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_windows"), r.getAs[Long]("n_dup_windows"),
            r.getAs[Int]("dup_doc")))).toMap
      val want = refProfile(docs)
      assert(got == want,
        s"sample $si: spark=$got ref=$want docs=${docs.map(_._2.length)}")
      // the property is non-vacuous: planted splices must produce
      // duplicated windows somewhere in most samples
      if (want.values.map(_._2).sum == 0)
        info(s"sample $si had no duplicated windows (short docs)")
    }
  }

  test("anchor window dedup matches a brute-force span-removal reference on random corpora") {
    // x198's reconstruction on top of the x197 machinery: duplicate
    // spans merged and cut, remainder concatenated — checked against
    // an independent sequential implementation (anchors, first-
    // occurrence order, interval merge, substring surgery) on
    // randomized corpora with planted cross-doc splices
    val n = 20; val window = 8; val mod = 8
    def refAnchors(s: String): Seq[Int] =
      if (s.length < window) Seq.empty
      else (window to s.length).filter { i =>
        val h = (i - window until i)
          .foldLeft(0L)((acc, j) => acc * 31L + s.charAt(j).toLong)
        h % mod == 0
      }
    def refDedup(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
      val wins = for {
        (id, s) <- docs if s.nonEmpty
        pos <- refAnchors(s) if pos + n <= s.length
      } yield (id, pos, s.substring(pos, pos + n))
      val winner = wins.groupBy(_._3)
        .map { case (seg, rows) => seg -> rows.map(r => (r._1, r._2)).min }
      val dupPs = wins.filter { case (i, p, seg) => winner(seg) != ((i, p)) }
        .groupBy(_._1).view.mapValues(_.map(_._2).sorted.toList).toMap
      docs.filter(_._2.nonEmpty).map { case (id, s) =>
        val merged = dupPs.getOrElse(id, Nil)
          .foldLeft(List.empty[(Int, Int)]) { (acc, p) =>
            acc match {
              case (st, en) :: rest if p <= en => (st, p + n) :: rest
              case _ => (p, p + n) :: acc
            }
          }.reverse
        val sb = new StringBuilder; var prev = 0
        merged.foreach { case (st, en) =>
          sb.append(s.substring(prev, st)); prev = en
        }
        sb.append(s.substring(prev))
        id -> ((merged.size.toLong,
          merged.map { case (st, en) => en - st }.sum.toLong, sb.toString))
      }.toMap
    }
    val alphabet = Gen.oneOf('a', 'b', 'c', 'd', ' ')
    val corpusGen = for {
      k <- Gen.choose(8, 20)
      base <- Gen.listOfN(k, for {
        len <- Gen.choose(0, 240)
        cs <- Gen.listOfN(len, alphabet)
      } yield cs.mkString)
      splices <- Gen.listOfN(k, Gen.choose(0, 1000))
    } yield base.zipWithIndex.map { case (s, i) =>
      val donor = base((i + 1) % k)
      val text =
        if (i % 2 == 1 && donor.length > 80)
          s.take(splices(i) % (s.length + 1)) + donor.substring(10, 80) +
            s.drop(splices(i) % (s.length + 1))
        else s
      (i.toLong, text)
    }
    samples(corpusGen, 6).zipWithIndex.foreach { case (docs, si) =>
      val got = graft.ops.Dedup.anchorWindowDedup(
        docs.toDF("doc_id", "text"), "doc_id", "text", n, window, mod)
        .collect().map(r => r.getAs[Long]("doc_id") ->
          ((r.getAs[Long]("n_dup_spans"), r.getAs[Long]("chars_removed"),
            r.getAs[String]("clean_text")))).toMap
      val want = refDedup(docs)
      assert(got == want, s"sample $si: spark=$got ref=$want")
      if (want.values.map(_._1).sum == 0)
        info(s"sample $si had no duplicate spans (short docs)")
    }
  }

  test("winnowing guarantee holds on random shared substrings") {
    // any shared substring of length >= window + k - 1 must yield a
    // common fingerprint (the MOSS guarantee) — random docs, random
    // shared passage well above the threshold
    val k = 8; val window = 4
    val gen = for {
      shared <- Gen.listOfN(40, Gen.alphaLowerChar).map(_.mkString)
      p1 <- Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
      p2 <- Gen.listOfN(30, Gen.alphaLowerChar).map(_.mkString)
    } yield (s"$p1 $shared", s"$shared $p2")
    val docs = samples(gen, 40)
    val df = docs.zipWithIndex.map { case ((a, b), i) => (i.toLong, a, b) }
      .toDF("id", "da", "db")
    val fps = df.select(col("id"),
      Sketches.winnowingFingerprint(col("da"), k, window).as("fa"),
      Sketches.winnowingFingerprint(col("db"), k, window).as("fb"))
      .collect()
    fps.foreach { r =>
      val shared = r.getSeq[Long](1).toSet intersect r.getSeq[Long](2).toSet
      assert(shared.nonEmpty, s"doc pair ${r.getLong(0)} shares no fingerprints")
    }
  }
}
