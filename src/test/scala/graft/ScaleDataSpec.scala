package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Contracts of the scale-rehearsal corpus generator: the r13
  * rehearsal's conclusions are only reproducible if the derived
  * corpus is deterministic and its duplicate mix is what PERF.md
  * says it is. */
class ScaleDataSpec extends AnyFunSuite {
  import SparkTestSession.{sfDir, spark}

  private val Stride = 1000000L
  private lazy val src = Tables.documents(spark, sfDir)
  private lazy val baseText = src
    .select(col("doc_id"), col("text")).collect()
    .map(r => r.getLong(0) -> r.getString(1)).toMap

  test("scaleDocuments: deterministic, factor-x counts, disjoint replica ids") {
    val a = ScaleData.scaleDocuments(src, 3)
    val b = ScaleData.scaleDocuments(src, 3)
    val aRows = a.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    val bRows = b.select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSet
    assert(aRows == bRows, "two builds of the same corpus must be identical")
    assert(aRows.size == baseText.size * 3, "row count must be factor x source")
    assert(a.select("doc_id").distinct().count() == baseText.size * 3L,
      "replica ids must be disjoint (id + r*stride)")
  }

  test("id-stride guard: source ids at/above the replica stride fail loudly") {
    // r13 advice: a larger source corpus would silently alias replica
    // doc_id spaces (doc_id + r*stride collides with a later source
    // id) and corrupt the duplicate-family structure under test — the
    // generator now checks max(id) < stride per scaled table
    import spark.implicits._
    val colliding = Seq((Stride, "over the stride"), (1L, "fine"))
      .toDF("doc_id", "text").withColumn("n_chars", length(col("text")))
    val e = intercept[IllegalArgumentException] {
      ScaleData.scaleDocuments(colliding, 2)
    }
    assert(e.getMessage.contains("collide"), e.getMessage)
    val collidingVec = Seq((Stride, Array(1.0f)), (1L, Array(0.5f)))
      .toDF("vec_id", "embedding")
    assert(intercept[IllegalArgumentException] {
      ScaleData.scaleEmbeddings(collidingVec, 2)
    }.getMessage.contains("collide"))
  }

  test("scaleDocuments: replica 0 verbatim; replica rows follow the exact/near/novel mix") {
    val rows = ScaleData.scaleDocuments(src, 4)
      .select(col("doc_id"), col("text"), col("n_chars")).collect()
    var exact, near, novel = 0
    rows.foreach { r =>
      val id = r.getLong(0); val text = r.getString(1)
      val base = baseText(id % Stride)
      val rep = id / Stride
      // n_chars stays consistent with the rewritten text (the corpus
      // quality gate must stay green on the derived corpus)
      assert(r.getAs[Number](2).longValue == text.length.toLong,
        s"n_chars drift on $id")
      // ASCII only (the x46 oracle-parity gate)
      assert(text.forall(_ < 128), s"non-ASCII introduced on $id")
      if (rep == 0) {
        assert(text == base, s"replica 0 must be verbatim (doc $id)")
      } else if (text == base) {
        exact += 1 // cross-replica exact copy under a new id
      } else {
        val toks = text.split(" ")
        val baseToks = base.split(" ")
        if (toks.length == baseToks.length + 1 &&
            toks.filterNot(_ == s"rtag$rep").sameElements(baseToks)) {
          near += 1 // one replica-tagged token spliced at a boundary
        } else {
          novel += 1
          assert(text.contains(s" tail$rep"), s"novel tail missing on $id")
        }
      }
    }
    val repRows = (exact + near + novel).toDouble
    assert(repRows == baseText.size * 3.0, "replica >= 1 rows misclassified")
    // pmod(hash, 10) < 3 / < 6 / else: expect ~30/30/40 with hash
    // concentration; wide bounds keep the pin fixture-size robust
    assert(exact / repRows > 0.2 && exact / repRows < 0.4,
      s"exact mix off: ${exact / repRows}")
    assert(near / repRows > 0.2 && near / repRows < 0.4,
      s"near mix off: ${near / repRows}")
    assert(novel / repRows > 0.3 && novel / repRows < 0.5,
      s"novel mix off: ${novel / repRows}")
  }

  test("scaleEmbeddings: replica 0 verbatim; near stays within its ANN cell radius") {
    val srcEmb = Tables.embeddings(spark, sfDir)
    val baseVec = srcEmb.select(col("vec_id"), col("embedding")).collect()
      .map(r => r.getLong(0) -> r.getSeq[Float](1)).toMap
    val rows = ScaleData.scaleEmbeddings(srcEmb, 3)
      .select(col("vec_id"), col("embedding")).collect()
    assert(rows.length == baseVec.size * 3)
    var near, novel = 0
    rows.foreach { r =>
      val id = r.getLong(0); val vec = r.getSeq[Float](1)
      val base = baseVec(id % Stride)
      val maxDelta = vec.zip(base).map { case (x, y) => math.abs(x - y) }.max
      if (id / Stride == 0) assert(maxDelta == 0f, s"replica 0 drift on $id")
      else if (maxDelta == 0f) () // exact copy
      else if (maxDelta <= 0.0101f) near += 1 // eps 0.01 perturbation
      else { assert(maxDelta <= 0.51f, s"novel delta out of range on $id"); novel += 1 }
    }
    assert(near > 0 && novel > 0, "both perturbation classes must occur")
  }

  test("scaleEvents: disjoint user populations, bounded value jitter") {
    val srcEv = Tables.events(spark, sfDir)
    val out = ScaleData.scaleEvents(srcEv, 2)
    assert(out.count() == srcEv.count() * 2)
    // per-replica user ranges must not overlap: replica tag of every
    // user_id equals the replica tag of its event_id
    val mixed = out.filter(
      (col("user_id") / Stride).cast("long") =!=
        (col("event_id") / Stride).cast("long")).count()
    assert(mixed == 0, "user/event replica ranges must move together")
    val jitter = out.filter(col("event_id") >= Stride)
      .join(srcEv.select(col("event_id").as("bid"), col("value").as("bv")),
        pmod(col("event_id"), lit(Stride)) === col("bid"))
      .select(max(abs(col("value") / col("bv") - 1.0))).collect()(0).getDouble(0)
    assert(jitter <= 0.1001, s"value jitter must stay within 10%: $jitter")
  }
}
