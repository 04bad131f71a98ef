package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main — one JSON line of per-query wall-clock seconds over
  * `SPARK_GRAFT_SF_DIR` (driver contract). Queries run in sorted name order
  * after an untimed warmup job, so JVM/codegen/page-cache startup cost
  * doesn't land on whichever query happens to run first.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Untimed warmup: touches every fixture file and exercises codegen.
    try SparkEntry.queries.get("q01_pricing_summary").foreach(_(spark, sfDir).count())
    catch { case _: Throwable => () }

    // Transfer benchmarks run FIRST, in near-fresh JVM state: round 2
    // measured them after the 68-query sweep and recorded roughly a third
    // of round 1's throughput — heap pressure and page-cache churn from the
    // sweep, not a transfer regression. One small untimed transfer warms
    // the write path so codegen/committer startup doesn't bill the
    // measurement either.
    try {
      val warm = java.nio.file.Files.createTempDirectory("graft_bench_warm").toString
      new graft.transfer.TransferEngine(
        new graft.transfer.ParquetSource(sfDir), new graft.transfer.ParquetSink(warm))
        .transferTable(spark, "nation")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(warm))
    } catch { case _: Throwable => () }

    // Transfer throughput (rows/s) on the largest table — the comparable to
    // BASELINE.md's 50k-200k rows/s single-process transfer numbers.
    val transferRps = try {
      val out = java.nio.file.Files.createTempDirectory("graft_bench_xfer").toString
      val engine = new graft.transfer.TransferEngine(
        new graft.transfer.ParquetSource(sfDir), new graft.transfer.ParquetSink(out))
      val stats = engine.transferTable(spark, "lineitem")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      if (stats.success) stats.rowsPerSecond else -1.0
    } catch { case _: Throwable => -1.0 }

    // Whole-schema transfer with 4 parallel table workers — the reference's
    // benchmark configuration (README.md:384-385: --workers 4 → 50k-200k
    // rows/s); aggregate rows over wall-clock.
    val schemaRps = try {
      val out = java.nio.file.Files.createTempDirectory("graft_bench_schema").toString
      val engine = new graft.transfer.TransferEngine(
        new graft.transfer.ParquetSource(sfDir), new graft.transfer.ParquetSink(out))
      val t0 = System.nanoTime()
      val stats = engine.transferSchema(spark, graft.sources.Tables.all, workers = 4)
      val secs = (System.nanoTime() - t0) / 1e9
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      if (stats.forall(_.success) && secs > 0) stats.map(_.rowsTransferred).sum / secs
      else -1.0
    } catch { case _: Throwable => -1.0 }

    // COPY-path throughput: the same lineitem through the CSV bulk sink
    // (string formatting + minimal quoting is the extra cost vs parquet —
    // the honest comparable to the reference's CSV+COPY pipeline).
    val csvRps = try {
      val out = java.nio.file.Files.createTempDirectory("graft_bench_csv").toString
      val engine = new graft.transfer.TransferEngine(
        new graft.transfer.ParquetSource(sfDir), new graft.transfer.CsvBulkSink(out))
      val stats = engine.transferTable(spark, "lineitem")
      org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(out))
      if (stats.success) stats.rowsPerSecond else -1.0
    } catch { case _: Throwable => -1.0 }

    // Query sweep. A failed query records its wall-time NEGATED (sentinel)
    // and lands in "errors" — a broken query must never read as a fast one.
    // Cached/checkpointed blocks are dropped after every query: several
    // operators cache intermediates for intra-query reuse, and letting 79
    // queries' worth pile up degrades the late sweep (round-3 bench showed
    // 2-6x late-query inflation vs the same queries in a clean session).
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { fn(spark, sfDir).count(); true } catch { case _: Throwable => false }
      val secs = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(false))
      (name, if (ok) secs else -secs, ok)
    }
    // 3-decimal (ms) precision keeps the line short enough for the driver's
    // bounded tail capture — full-precision doubles pushed the headline
    // fields past the window in rounds 2-3
    val qs = results.map { case (k, v, _) => f""""$k":$v%.3f""" }
      .mkString("{", ",", "}")
    val errors = results.collect { case (k, _, false) => "\"" + k + "\"" }
      .mkString("[", ",", "]")
    val total = results.collect { case (_, v, true) => v }.sum

    // headline fields appear FIRST (driver contract) and are REPEATED in the
    // trailing `headline` object: the driver keeps only a bounded tail of
    // stdout, and in rounds 2-3 the leading metric/value/transfer numbers
    // fell off the front of the captured window
    val headline = s""""value":${f"$total%.3f"},""" +
      s""""transfer_rows_per_sec":${transferRps.round},""" +
      s""""schema_transfer_rows_per_sec":${schemaRps.round},""" +
      s""""csv_transfer_rows_per_sec":${csvRps.round}"""
    println(s"""{"metric":"total",$headline,"unit":"sec","queries":$qs,""" +
      s""""errors":$errors,"sf":"$sfDir","headline":{$headline}}""")
    spark.stop()
  }
}
