package graft

import graft.SparkSpec

/** Every `SparkEntry.queries` entry must analyze, optimize and execute
  * against the current fixtures. This is the in-build tripwire for the
  * round-6 failure class: the driver regenerates `/root/testdata` between
  * rounds, and a schema/encoding drift (events.ts → TIMESTAMP_NTZ) made
  * three queries fail ANALYSIS for a whole round — an error `sbt test`
  * never saw because no spec drove the full query map. `limit(1)` keeps
  * the execution cheap while still forcing resolution, optimization and
  * at least one task per query.
  */
class QuerySmokeSpec extends SparkSpec {

  test("all queries analyze and execute against the live fixtures") {
    val failures = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        try { fn(spark, sfDir).limit(1).collect(); None }
        catch { case e: Throwable =>
          Some(s"$name: ${e.getClass.getSimpleName}: " +
            e.getMessage.linesIterator.take(2).mkString(" "))
        }
    }
    assert(failures.isEmpty,
      s"${failures.size} queries broke against the current fixtures:\n" +
        failures.mkString("\n"))
  }

  test("every query has an oracle — no silent downgrades to rows-only checks") {
    val missing = SparkEntry.queries.keySet -- SparkEntry.oracleSql.keySet
    assert(missing.isEmpty,
      s"queries without oracle SQL (driver records only a weak rows-only " +
        s"check for these): ${missing.toSeq.sorted.mkString(", ")}")
  }
}
