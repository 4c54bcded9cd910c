package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants over the whole query surface. */
class ContractSpec extends AnyFunSuite with SparkSpec {

  test("every oracleSql key has a queries entry") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracle without query: $orphans")
  }

  test("entry() returns rows (driver smoke contract)") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every query is deterministic across two runs (sf0.001)") {
    // catches nondeterministic ordering/tie-breaks before the driver's
    // hash compare does
    val flaky = SparkEntry.queries.keys.toSeq.sorted.filter { name =>
      def run() = SparkEntry.queries(name)(spark, sf)
        .collect().map(_.toString).toSeq
      run() != run()
    }
    assert(flaky.isEmpty, s"nondeterministic queries: $flaky")
  }
}
