package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import java.nio.file.{Files, Paths}
import java.nio.charset.StandardCharsets

/** docs/playbook.md must track the compiler: the generated ops section
  * is byte-identical to PlaybookDoc's render of the live op map, and
  * the hand-written prose keeps every section heading. A new analytics
  * op without a doc regeneration fails here with the regen command. */
class PlaybookDocSpec extends AnyFunSuite {

  private val doc = new String(
    Files.readAllBytes(Paths.get("docs/playbook.md")), StandardCharsets.UTF_8)

  test("generated analytics-ops section matches the live op map") {
    val b = doc.indexOf(PlaybookDoc.beginMarker)
    val e = doc.indexOf(PlaybookDoc.endMarker)
    assert(b >= 0 && e > b, "docs/playbook.md is missing the generated-section markers")
    val committed = doc.substring(b + PlaybookDoc.beginMarker.length, e).trim
    assert(committed == PlaybookDoc.opsReference.trim,
      "docs/playbook.md ops table is stale — regenerate with: " +
        "sbt \"runMain graft.tools.PlaybookDoc\"")
  }

  test("every registered analytics op appears in the doc") {
    val missing = graft.compile.AnalyticsCompiler.ops.keySet
      .filterNot(op => doc.contains(s"`$op`"))
    assert(missing.isEmpty, s"ops missing from docs/playbook.md: $missing")
  }

  test("all playbook sections are documented") {
    Seq("## `source:`", "## `destination:`", "## `filter:`", "## `mappings:`",
      "## `flattening:`", "## `deduplication:`", "## `errorHandling:`",
      "## `analytics:`", "## Streaming mode", "## CLI",
      "bucketBy", "zorderBy", "bloomIndexBy", "quietPeriod").foreach { h =>
      assert(doc.contains(h), s"docs/playbook.md is missing: $h")
    }
  }
}
