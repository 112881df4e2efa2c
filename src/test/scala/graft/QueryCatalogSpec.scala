package graft

import org.scalatest.funsuite.AnyFunSuite

/** The generated QUERIES.md's no-rot promise, enforced at test time (not
  * just at regeneration): every declared query is locatable, every query
  * carries its own scaladoc, and the committed doc matches the sources —
  * so adding or editing a query without regenerating the catalog fails
  * `sbt test`, the same discipline PlanAuditSpec applies to PLANS.md's
  * red flags. Needs no SparkSession. */
class QueryCatalogSpec extends AnyFunSuite {

  test("catalog locates every declared query, each with a scaladoc summary") {
    val md = QueryCatalog.render() // throws if any query isn't found exactly once
    val rows = md.linesIterator.filter(_.startsWith("| `q_")).toSeq
    assert(rows.size == queries.Registry.all.size)
    val undocumented = rows.filter(_.matches("\\| `q_[a-z0-9_]+` \\| *\\|.*"))
    assert(undocumented.isEmpty,
      s"queries without their own scaladoc:\n${undocumented.mkString("\n")}")
  }

  test("committed QUERIES.md is current (regenerate with runMain graft.QueryCatalog)") {
    val committed = new String(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get("QUERIES.md")),
      java.nio.charset.StandardCharsets.UTF_8)
    assert(committed == QueryCatalog.render(),
      "QUERIES.md is stale — run `sbt \"runMain graft.QueryCatalog\"` and commit")
  }
}
