package graft

import org.scalatest.funsuite.AnyFunSuite

/** The registry's duplicate-name guard: a second Q with an existing name
  * would silently shadow the first in the `queries` Map and drop its
  * oracle from the correctness gate (the round-11 q_stratified_sample
  * incident) — the guard must fail loudly instead.
  */
class RegistrySuite extends AnyFunSuite {

  private def q(name: String): Q = Q.noOracle(name)((_, _) => null)

  test("duplicate names are rejected loudly, naming the offender") {
    val e = intercept[IllegalArgumentException] {
      SparkEntry.requireUniqueNames(Seq(q("a"), q("b"), q("a")))
    }
    assert(e.getMessage.contains("a"), s"offender not named: ${e.getMessage}")
  }

  test("unique names pass, and the LIVE registry is unique with 1:1 oracle keys") {
    SparkEntry.requireUniqueNames(Seq(q("a"), q("b")))
    // the real registry: every entry distinct, and the queries/oracle
    // maps lost nothing to shadowing
    assert(SparkEntry.registry.map(_.name).distinct.size ==
      SparkEntry.registry.size)
    assert(SparkEntry.queries.size == SparkEntry.registry.size)
    assert(SparkEntry.oracleSql.size ==
      SparkEntry.registry.count(_.oracle.isDefined))
  }
}
