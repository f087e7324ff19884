package graft

import org.scalatest.funsuite.AnyFunSuite

/** Doc-drift gate (r13 VERDICT "What's wrong" #2/#3): the README and
  * SURVEY catalog counts went stale two rounds running because they
  * were hand-maintained. This spec derives the one true number from
  * the registry itself ([[Queries.all]].size) and fails `sbt test`
  * whenever a doc line drifts — adding a catalog query now forces the
  * doc update in the same commit.
  *
  * Owned lines (each matched by an anchored regex so a reworded
  * sentence fails loudly rather than silently un-gating):
  *   - README.md  "the operator catalog — N named queries"
  *   - README.md  "Every catalog query (N as of rXX)"
  *   - SURVEY.md  "Catalog closing state: N hash-checked queries"
  */
class CatalogCountSpec extends AnyFunSuite {

  private def read(p: String): String =
    new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(p)),
      java.nio.charset.StandardCharsets.UTF_8)

  private def firstGroup(text: String, re: scala.util.matching.Regex,
      where: String): Int =
    re.findFirstMatchIn(text)
      .getOrElse(fail(s"count marker not found in $where (pattern $re)"))
      .group(1).toInt

  private val n = Queries.all.size

  test("README catalog counts match the registry") {
    val readme = read("README.md")
    val inventory = firstGroup(readme,
      raw"operator catalog — (\d+) named queries".r, "README.md inventory")
    val gate = firstGroup(readme,
      raw"Every catalog query \((\d+) as of r\d+\)".r, "README.md gate note")
    assert(inventory == n,
      s"README inventory says $inventory, registry has $n — update README.md")
    assert(gate == n,
      s"README gate note says $gate, registry has $n — update README.md")
  }

  test("SURVEY closing-state count matches the registry") {
    val survey = read("SURVEY.md")
    val closing = firstGroup(survey,
      raw"Catalog closing state: (\d+) hash-checked queries".r,
      "SURVEY.md closing state")
    assert(closing == n,
      s"SURVEY closing state says $closing, registry has $n — update SURVEY.md")
  }
}
