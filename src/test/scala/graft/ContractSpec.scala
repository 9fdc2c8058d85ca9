package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract guards: the invariants the correctness gate
  * depends on, enforced at test time so a future query cannot land
  * half-wired. No SparkSession needed — the maps are data. */
class ContractSpec extends AnyFunSuite {

  test("every oracle belongs to a registered query") {
    val orphans = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(orphans.isEmpty, s"oracles without queries: $orphans")
  }

  test("every query has an oracle (rows-only queries need a waiver here)") {
    // intentionally-rows-only queries would be listed in this waiver
    // set with the reason; currently every query is oracle-checked
    val waived = Set.empty[String]
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet -- waived
    assert(missing.isEmpty, s"queries without oracles: $missing")
  }

  test("every query name is declared in SURVEY §2") {
    val full = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("SURVEY.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    // only the §2 inventory counts — a backticked mention in the
    // build-plan narrative is not a capability bullet
    val survey = full.substring(full.indexOf("## §2"))
      .split("\n## §").head
    val declared = "`([a-z0-9_]+)`".r.findAllMatchIn(survey)
      .map(_.group(1)).toSet
    val undeclared = SparkEntry.queries.keySet -- declared
    assert(undeclared.isEmpty,
      s"queries missing a SURVEY §2 bullet: $undeclared")
  }

  test("query names are registry-unique across the four modules") {
    val sizes = Seq(TsdbQueries.queries.size, RelQueries.queries.size,
      PipelineQueries.queries.size, GraphiteQueries.queries.size)
    assert(sizes.sum == SparkEntry.queries.size,
      "duplicate query name collapsed in the merged map")
  }
}
