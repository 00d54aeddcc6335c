package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract invariants, guarded so a future gate can't silently
  * regress them: the driver's correctness gate hashes every
  * `queries` entry against its `oracleSql` twin, so a query without an
  * oracle is a weaker rows-only check the round would only discover at
  * judging time; duplicate names would shadow a gate in the Map; and a
  * malformed name breaks the per-round artifact diffing. Pure metadata —
  * no SparkSession needed. */
class ContractSpec extends AnyFunSuite {

  private lazy val names = SparkEntry.queries.keys.toSeq

  test("every query has a DuckDB oracle (no silent rows-only checks)") {
    val missing = names.filterNot(SparkEntry.oracleSql.contains)
    assert(missing.isEmpty, s"queries without oracles: $missing")
    val orphans = SparkEntry.oracleSql.keys.filterNot(SparkEntry.queries.contains)
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("names are well-formed and numbers are unique") {
    val pat = "^q(\\d+)_[a-z0-9_]+$".r
    val nums = names.map {
      case pat(n) => n.toInt
      case bad => fail(s"malformed query name: $bad")
    }
    val dups = nums.groupBy(identity).filter(_._2.size > 1).keys
    assert(dups.isEmpty, s"duplicate query numbers: $dups")
  }

  test("numbering is dense from q01 (the judge parses it that way)") {
    val pat = "^q(\\d+)_".r.unanchored
    val nums = names.map { n => pat.findFirstMatchIn(n).get.group(1).toInt }
    assert(nums.sorted == (1 to nums.max).toList,
      s"gaps in numbering: ${(1 to nums.max).toSet -- nums.toSet}")
  }
}
