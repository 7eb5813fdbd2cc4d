package graft

import org.scalatest.funsuite.AnyFunSuite

/** Registry invariants for the correctness gate: the driver's DuckDB
  * compare only covers queries that ship an oracle, so an oracle-less
  * registration silently weakens the gate to a rows-only check. */
class QueriesContractSpec extends AnyFunSuite {

  test("every registered query carries an oracle (inline SQL or pin)") {
    val missing = Queries.all
      .filter(q => q.oracle.isEmpty && !OraclePins.pins.contains(q.name))
      .map(_.name)
    assert(missing.isEmpty, s"oracle-less queries: $missing")
  }

  test("query names are unique") {
    val dups = Queries.all.groupBy(_.name).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query names: $dups")
  }

  test("oracleSql covers exactly the registered query set") {
    assert(SparkEntry.oracleSql.keySet == SparkEntry.queries.keySet)
  }
}
