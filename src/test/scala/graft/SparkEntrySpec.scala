package graft

import org.scalatest.funsuite.AnyFunSuite

/** The driver contract itself. */
class SparkEntrySpec extends AnyFunSuite {

  lazy val spark = Sessions.local()

  test("entry (driver t1 smoke) returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val qs = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(qs))
    assert(qs.size == SparkEntry.gates.size, "duplicate gate names")
  }
}
