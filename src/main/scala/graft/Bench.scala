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

    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      try { fn(spark, sfDir).count() } catch { case _: Throwable => -1L }
      name -> (System.nanoTime() - t0) / 1e9
    }
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val total = if (results.nonEmpty) results.map(_._2).sum else 0.0

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

    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,""" +
      s""""transfer_rows_per_sec":${transferRps.round},""" +
      s""""schema_transfer_rows_per_sec":${schemaRps.round},"sf":"$sfDir"}""")
    spark.stop()
  }
}
