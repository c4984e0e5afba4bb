package graft

import org.scalatest.funsuite.AnyFunSuite

/** Structural enforcement of the rows-only twin discipline
  * ([[TwinLedger]], r15 verdict #5): the per-round "is the no_oracle
  * set still exactly the twinned set?" audit becomes a set diff
  * against the ledger, and the ledger itself cannot rot — its rows
  * must match the live driver registry, its twin chains must end at
  * hash-green queries, and its contract strings must name tests that
  * exist in the test sources verbatim. No Spark session needed:
  * everything here is registry metadata. */
class TwinLedgerSpec extends AnyFunSuite {

  private lazy val queryNames = SparkEntry.queries.keySet
  private lazy val oracled = SparkEntry.oracleSql.keySet
  private lazy val rowsOnly = queryNames diff oracled
  private lazy val byName = TwinLedger.entries.map(e => e.query -> e).toMap

  test("ledger rows == rows-only driver queries (no gaps, no stale rows)") {
    val names = TwinLedger.entries.map(_.query)
    assert(names.distinct == names, "duplicate ledger entries")
    val missing = rowsOnly diff byName.keySet
    val stale = byName.keySet diff rowsOnly
    assert(missing.isEmpty,
      s"rows-only queries without a ledger row: ${missing.toSeq.sorted}")
    assert(stale.isEmpty,
      "ledger rows for queries that are no longer rows-only (gained an " +
        s"oracle or vanished): ${stale.toSeq.sorted}")
  }

  test("every twin chain terminates at a hash-green query, cycle-free") {
    TwinLedger.entries.foreach { e =>
      e.twin match {
        case None =>
          assert(e.why.nonEmpty,
            s"${e.query}: contract-only entries must say why no twin exists")
        case Some(t0) =>
          var cur = t0
          var hops = 0
          val seen = scala.collection.mutable.Set(e.query)
          while (!oracled.contains(cur)) {
            assert(queryNames.contains(cur),
              s"${e.query}: twin '$cur' is not a registered query")
            assert(seen.add(cur), s"${e.query}: twin chain cycles at $cur")
            hops += 1
            assert(hops <= 5, s"${e.query}: twin chain exceeds 5 hops")
            val next = byName.get(cur).flatMap(_.twin)
            assert(next.isDefined,
              s"${e.query}: twin chain dead-ends at rows-only '$cur' " +
                "which has no twin of its own")
            cur = next.get
          }
          assert(queryNames.contains(cur),
            s"${e.query}: terminal twin '$cur' is not a registered query")
      }
    }
  }

  test("every contract names a test that exists verbatim in the test sources") {
    import java.nio.file.{Files, Paths}
    import scala.jdk.CollectionConverters._
    val walk = Files.walk(Paths.get("src/test/scala"))
    val sources =
      try walk.iterator().asScala
        .filter(_.toString.endsWith(".scala"))
        .map(p => new String(Files.readAllBytes(p), "UTF-8"))
        .toVector
      finally walk.close()
    TwinLedger.entries.foreach { e =>
      assert(e.contract.nonEmpty, s"${e.query}: empty contract")
      assert(sources.exists(_.contains("\"" + e.contract + "\"")),
        s"${e.query}: contract test not found in src/test/scala: " +
          s"'${e.contract}'")
    }
  }
}
