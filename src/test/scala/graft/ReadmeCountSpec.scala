package graft

import org.scalatest.funsuite.AnyFunSuite

/** README.md advertises the oracle-checked query count; rounds 6 and 7 both
  * shipped it stale (123→124, then 124→125). Pin it to
  * `SparkEntry.queries.size` so the number can never drift again — adding a
  * query without touching the README now fails the build.
  */
class ReadmeCountSpec extends AnyFunSuite {

  test("README query count matches SparkEntry.queries.size") {
    val readme = new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("README.md")), java.nio.charset.StandardCharsets.UTF_8)
    val counts = raw"(\d+) oracle-checked".r
      .findAllMatchIn(readme).map(_.group(1).toInt).toList
    assert(counts.nonEmpty, "README no longer states the oracle-checked query count")
    counts.foreach { c =>
      assert(c === SparkEntry.queries.size,
        s"README says $c oracle-checked queries but SparkEntry declares " +
          s"${SparkEntry.queries.size} — update README.md")
    }
  }
}
