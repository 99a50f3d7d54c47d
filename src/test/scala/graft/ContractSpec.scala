package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries._

/** Guards on the driver contract itself: SparkEntry merges per-module
  * query maps, where a duplicate key would silently shadow a query and
  * an oracle without a query (or vice versa) would weaken the gate
  * without failing anything. */
class ContractSpec extends AnyFunSuite {

  private val moduleDefs = Seq(
    "CoreRelational" -> CoreRelational.defs.keySet,
    "FilterProject" -> FilterProject.defs.keySet,
    "ScalarFuncs" -> ScalarFuncs.defs.keySet,
    "EventQueries" -> EventQueries.defs.keySet,
    "StarSchemaQueries" -> StarSchemaQueries.defs.keySet,
    "TextPipeline" -> TextPipeline.defs.keySet,
    "SourceQueries" -> SourceQueries.defs.keySet)

  /** Queries that intentionally have NO oracle (approximate results).
    * Empty since r3: an4's sketch is hard-checked via the bounded-error
    * relation (exact counts + within-bound booleans the oracle replays). */
  private val rowsOnly = Set.empty[String]

  test("no query name is defined in two modules (merge would shadow one)") {
    val dup = moduleDefs.flatMap { case (m, ks) => ks.map(_ -> m) }
      .groupBy(_._1).filter(_._2.size > 1)
    assert(dup.isEmpty, s"duplicate query names across modules: $dup")
  }

  test("every query has an oracle, except the declared rows-only set") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing === rowsOnly,
      s"queries without an oracle beyond the declared rows-only set")
  }

  test("every oracle has a query (an orphan oracle checks nothing)") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }
}
