package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards on the query/oracle registries themselves: a Scala `Map(...)`
  * literal silently keeps the LAST duplicate key, which once erased a
  * declared query from the correctness gate with no signal (NOTES r14).
  * The registries are built through [[SparkEntry.dmap]]/[[SparkEntry.dmerge]],
  * which make a duplicate name a hard failure.
  */
class RegistrySpec extends AnyFunSuite {

  test("a deliberately duplicated query name fails fast, not a silent drop") {
    val e = intercept[IllegalArgumentException](
      SparkEntry.dmap("q_a" -> 1, "q_b" -> 2, "q_a" -> 3))
    assert(e.getMessage.contains("q_a"))
  }

  test("cross-segment name collisions fail fast in the merge") {
    val e = intercept[IllegalArgumentException](
      SparkEntry.dmerge(Map("q_a" -> 1), Map("q_b" -> 2, "q_a" -> 3)))
    assert(e.getMessage.contains("q_a"))
  }

  test("full registries materialize; every oracle names a declared query") {
    val qs = SparkEntry.queries.keySet // forces every dmap/dmerge check
    val os = SparkEntry.oracleSql.keySet
    assert(qs.nonEmpty)
    assert(os.subsetOf(qs),
      s"oracle entries without a query: ${(os -- qs).mkString(", ")}")
  }
}
