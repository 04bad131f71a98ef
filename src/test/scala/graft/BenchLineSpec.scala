package graft

import org.scalatest.funsuite.AnyFunSuite

/** The round driver stores only a ~2000-character stdout TAIL of the bench
  * run (sbt's trailing "[success] Total time: …" line eats ~80 of them) and
  * parses the JSON line out of it. Rounds 2-6 recorded `parsed: null`
  * because the line outgrew that window; round 7's full-roster line fit at
  * 1815 chars but the captured tail already showed its FRONT clipped into a
  * stray warning. `Bench.stdoutLine` now emits headline + slowest-N medians
  * only, bounded at `MaxLineLength` (half the window) for ANY roster size or
  * failure count. This spec drives the mechanism with the real roster plus
  * pathological inputs so suite growth can never regress the artifact.
  */
class BenchLineSpec extends AnyFunSuite {

  private val names = SparkEntry.queries.keys.toSeq.sorted
  private val headline =
    """"metric":"total","value":99999.999,"unit":"sec",""" +
      """"stat":"median_of_3","transfer_rows_per_sec":9999999,""" +
      """"schema_transfer_rows_per_sec":9999999,""" +
      """"csv_transfer_rows_per_sec":9999999,"throttled_count":99,""" +
      """"cpu_total_secs":99999.999,"calib_median":9.999,""" +
      """"calib_par_median":9.999"""

  test("stdout line stays under the budget with every query slow") {
    val line = Bench.stdoutLine(names.map(_ -> 99.999), Nil, headline,
      "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineLength,
      s"line ${line.length} chars > ${Bench.MaxLineLength} — the slowest-N " +
        "ladder is broken; the artifact would risk the parsed:null mode again")
    assert(line.startsWith("{") && line.endsWith("}"))
    // headline + suite size survive; the full map does NOT ride the line
    assert(line.contains(""""metric":"total""""))
    assert(line.contains(s""""queries_total":${names.size}"""))
  }

  test("budget is half the driver tail window") {
    // the window is ~2000 chars and r7 proved that filling it clips the
    // front; the budget must leave generous headroom for stray warnings
    assert(Bench.MaxLineLength <= 1000)
  }

  test("line carries the slowest medians, not the first alphabetically") {
    val medians = names.zipWithIndex.map { case (n, i) => n -> (i + 1) * 0.01 }
    val line = Bench.stdoutLine(medians, Nil, headline, "sf")
    val slowest = medians.sortBy(-_._2).take(3).map(_._1)
    val keys = Bench.shortKeys(names)
    slowest.foreach { n =>
      assert(line.contains("\"" + keys(n) + "\":"),
        s"slowest query $n missing from the stdout line")
    }
  }

  test("line is bounded even when every query errors with a long name") {
    val longNames = (1 to 300).map(i => f"q$i%03d_exhaustively_described_failure_mode_name")
    val line = Bench.stdoutLine(Nil, longNames, headline, "/root/testdata/sf0.1")
    assert(line.length <= Bench.MaxLineLength,
      "last rung must truncate the error list — a mass failure must still parse")
    assert(line.contains(""""errors_total":300"""))
  }

  test("short keys never merge two queries") {
    val keys = Bench.shortKeys(names)
    assert(keys.values.toSet.size === names.size,
      "short-key collision would silently merge two queries' timings")
  }

  test("detail stamp uses the correctness round still awaiting its bench") {
    // round-12 verdict item 3: the driver writes CORRECTNESS_rN BEFORE the
    // bench, so "max seen + 1" stamped the official r12 detail as r13
    import java.nio.file.Files
    def dirWith(files: String*): java.io.File = {
      val d = Files.createTempDirectory("graft_bench_stamp").toFile
      d.deleteOnExit()
      files.foreach(f => Files.createFile(d.toPath.resolve(f)))
      d
    }
    // mid-round: CORRECTNESS_r12 exists, BENCH_r12 doesn't — the run about
    // to happen IS round 12's bench
    assert(Bench.detailFileName(dirWith(
      "CORRECTNESS_r11.json", "BENCH_r11.json", "CORRECTNESS_r12.json"))
      === "BENCH_DETAIL_r12.json")
    // between rounds: every correctness has its bench — next round's stamp
    assert(Bench.detailFileName(dirWith(
      "CORRECTNESS_r12.json", "BENCH_r12.json"))
      === "BENCH_DETAIL_r13.json")
    // virgin repo
    assert(Bench.detailFileName(dirWith()) === "BENCH_DETAIL_r0.json")
  }

  test("rerun triggers on a singleton clean subset, not just raw spread") {
    // round-9 advice: [1.0, 3.5, 3.6] sits under the 4x spread threshold,
    // yet cleanReps keeps only [1.0] — the median would rest on one rep.
    val bimodal = Seq(1.0, 3.5, 3.6)
    assert(Bench.cleanReps(bimodal) === Seq(1.0))
    assert(Bench.needsRerun(bimodal), "singleton clean subset must rerun")
    // raw-spread trigger unchanged
    assert(Bench.needsRerun(Seq(1.0, 1.1, 20.0)))
    // a healthy block reruns nothing
    assert(!Bench.needsRerun(Seq(1.0, 1.2, 1.1)))
    // two clean members suffice even with one discarded throttle rep
    assert(!Bench.needsRerun(Seq(1.0, 1.2, 3.9)))
    assert(!Bench.needsRerun(Nil))
  }
}
