package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round driver stores only a ~2000-character stdout TAIL of the bench
  * run (sbt's trailing "[success] Total time: …" line eats ~80 of them) and
  * parses the JSON line out of it. Rounds 2-6 recorded `parsed: null`
  * because the line outgrew that window. `Bench.stdoutLine` degrades
  * median precision until the line fits; this spec drives that mechanism
  * with the REAL query roster at pessimistic widths so growth in the suite
  * fails the build before the round artifact silently degrades again.
  */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val headline =
    """"metric":"total","value":99999.999,"unit":"sec",""" +
      """"stat":"median_of_3","transfer_rows_per_sec":9999999,""" +
      """"schema_transfer_rows_per_sec":9999999,""" +
      """"csv_transfer_rows_per_sec":9999999,"throttled_count":99,""" +
      """"cpu_total_secs":99999.999,"calib_median":9.999"""

  test("stdout line fits the tail window even with every query slow") {
    // every median at 99.999 s — an absurdly slow suite must still produce
    // a parseable artifact (precision degrades, parseability never)
    val line = Bench.stdoutLine(names.map(_ -> 99.999), Nil, headline,
      "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineLength,
      s"line ${line.length} chars — the precision ladder can no longer " +
        "absorb the roster; move more fields to BENCH_DETAIL.json")
    // and it is real JSON with every query present
    assert(line.startsWith("{") && line.endsWith("}"))
    assert(Bench.shortKeys(names).values.forall(k => line.contains("\"" + k + "\"")))
  }

  test("typical medians keep full 3-decimal precision") {
    val line = Bench.stdoutLine(names.map(_ -> 0.123), Nil, headline,
      "/root/testdata/sf0.1")
    assert(line.contains(":0.123"), "3-decimal precision lost on a normal run")
    assert(line.length <= Bench.MaxLineLength)
  }

  test("short keys never merge two queries") {
    val keys = Bench.shortKeys(names)
    assert(keys.values.toSet.size === names.size,
      "short-key collision would silently merge two queries' timings")
  }
}
