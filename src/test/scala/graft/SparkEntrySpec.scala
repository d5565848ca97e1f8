package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract sanity: unique query names, every oracle key backed
  * by a query, and the flagship entry returning rows on the smoke SF.
  */
class SparkEntrySpec extends AnyFunSuite {

  test("query names are unique (toMap would silently drop duplicates)") {
    val names = SparkEntry.all.map(_._1)
    assert(names.distinct.size == names.size)
    assert(SparkEntry.queries.size == names.size)
  }

  test("every oracle key has a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("flagship entry returns rows at the smoke scale factor") {
    assert(SparkEntry.entry(SparkTestBase.spark).count() > 0)
  }
}
