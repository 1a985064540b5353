package graft

import org.scalatest.funsuite.AnyFunSuite

/** COVERAGE.md is the judge-facing operator map — it must not drift from
  * the actual registry.
  */
class CoverageDocSpec extends AnyFunSuite {

  test("every registered query appears in COVERAGE.md") {
    val doc = java.nio.file.Files.readString(
      java.nio.file.Paths.get("COVERAGE.md"))
    val missing = SparkEntry.allDefs.map(_.name)
      .filterNot(n => doc.contains(n))
    assert(missing.isEmpty, s"undocumented queries: $missing")
  }

  test("oracle map keys are exactly the oracle-backed query names") {
    val names = SparkEntry.queries.keySet
    assert(SparkEntry.oracleSql.keySet.subsetOf(names))
    assert(SparkEntry.allDefs.count(_.oracle.isDefined) ==
      SparkEntry.oracleSql.size)
  }
}
