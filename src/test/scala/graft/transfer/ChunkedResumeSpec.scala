package graft.transfer

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.SparkSpec

/** Mid-table resume (checkpoint.py:60-74 + data_transfer.py:300-323): a
  * transfer killed mid-table must restart from its last committed chunk,
  * not from zero — exercising the `in_progress` half of the checkpoint
  * format that plain whole-table retry never touches. */
class ChunkedResumeSpec extends SparkSpec {

  /** Wraps a sink, crashing on the Nth chunk write and recording the
    * chunk-level call pattern. */
  private class FlakySink(inner: TableSink, failOnChunk: Int = Int.MaxValue) extends TableSink {
    var chunkWrites = 0
    var firstFlags: List[Boolean] = Nil
    def write(df: DataFrame, table: String): Unit = inner.write(df, table)
    override def writeChunk(df: DataFrame, table: String, firstChunk: Boolean): Unit = {
      if (chunkWrites == failOnChunk) throw new RuntimeException("simulated mid-table crash")
      chunkWrites += 1
      firstFlags :+= firstChunk
      inner.writeChunk(df, table, firstChunk)
    }
    override def countRows(spark: SparkSession, table: String): Option[Long] =
      inner.countRows(spark, table)
  }

  test("crash mid-table, rerun transfers only the remaining chunks") {
    val out = Files.createTempDirectory("chunked").toString
    val cp = new CheckpointManager(s"$out/ckpt.json", "sf", "pq")
    val parquet = new ParquetSink(out)
    val chunking = Map("orders" -> "o_orderkey")

    // run 1: dies after committing 2 of 5 chunks
    val flaky = new FlakySink(parquet, failOnChunk = 2)
    val engine1 = new TransferEngine(new ParquetSource(sfDir), flaky, Some(cp),
      chunkColumns = chunking, chunkCount = 5)
    val s1 = engine1.transferTable(spark, "orders")
    assert(!s1.success && s1.errorMessage.exists(_.contains("simulated")))
    assert(flaky.chunkWrites == 2)
    assert(flaky.firstFlags.head && !flaky.firstFlags(1)) // overwrite, then append

    // the checkpoint recorded committed-chunk progress: not completed, > 0
    assert(!cp.isCompleted("orders"))
    val watermark = cp.resumeOffset("orders")
    assert(watermark == 2) // two chunks landed before the crash
    val committed = spark.read.parquet(s"$out/orders.parquet").count()
    val total = spark.read.parquet(s"$sfDir/orders.parquet").count()
    assert(committed > 0 && committed < total, s"committed=$committed total=$total")

    // run 2 (fresh engine, reloaded checkpoint — a new process): finishes
    val cp2 = new CheckpointManager(s"$out/ckpt.json", "sf", "pq")
    assert(cp2.resumeOffset("orders") == watermark) // watermark survived the crash
    val healthy = new FlakySink(parquet)
    val engine2 = new TransferEngine(new ParquetSource(sfDir), healthy, Some(cp2),
      chunkColumns = chunking, chunkCount = 5)
    val s2 = engine2.transferTable(spark, "orders")
    assert(s2.success, s2.errorMessage)
    assert(s2.rowsTransferred == total)
    assert(spark.read.parquet(s"$out/orders.parquet").count() == total)
    // only the REMAINING 3 chunks ran, every one as an append (no restart)
    assert(healthy.chunkWrites == 3, s"reran ${healthy.chunkWrites} chunks")
    assert(healthy.firstFlags.forall(_ == false))
    // resumed rows are disjoint from committed ones: no duplicates at all
    val dupes = spark.read.parquet(s"$out/orders.parquet")
      .groupBy("o_orderkey").count().filter("count > 1").count()
    assert(dupes == 0)
    assert(cp2.isCompleted("orders"))
  }

  test("negative and zero-crossing chunk keys resume without duplication") {
    // chunk-count progress (not a key watermark) — a key bound of 0 or
    // negative would read as "never started" and re-append committed chunks
    val src = Files.createTempDirectory("negkeys_src").toString
    spark.range(-50, 50).selectExpr("id AS k", "id * 2 AS v")
      .write.parquet(s"$src/negkeys.parquet")
    val out = Files.createTempDirectory("negkeys_out").toString
    val cp = new CheckpointManager(s"$out/ckpt.json", "sf", "pq")
    val chunking = Map("negkeys" -> "k")

    val flaky = new FlakySink(new ParquetSink(out), failOnChunk = 2)
    val s1 = new TransferEngine(new ParquetSource(src), flaky, Some(cp),
      chunkColumns = chunking, chunkCount = 5).transferTable(spark, "negkeys")
    assert(!s1.success)
    assert(cp.resumeOffset("negkeys") == 2) // two committed chunks

    val cp2 = new CheckpointManager(s"$out/ckpt.json", "sf", "pq")
    val healthy = new FlakySink(new ParquetSink(out))
    val s2 = new TransferEngine(new ParquetSource(src), healthy, Some(cp2),
      chunkColumns = chunking, chunkCount = 5).transferTable(spark, "negkeys")
    assert(s2.success, s2.errorMessage)
    assert(healthy.chunkWrites == 3 && healthy.firstFlags.forall(_ == false))
    val result = spark.read.parquet(s"$out/negkeys.parquet")
    assert(result.count() == 100)
    assert(result.groupBy("k").count().filter("count > 1").count() == 0, "duplicated chunks")
  }

  test("null or fractional chunk keys are rejected, not silently dropped") {
    // chunk predicates filter on the raw key: a NULL key matches no range,
    // and a fractional key above the truncated max (10.7 vs hi=10) escapes
    // the last chunk — both must fail the transfer instead of losing rows
    val src = Files.createTempDirectory("badkeys_src").toString
    spark.range(0, 10).selectExpr(
      "CASE WHEN id = 3 THEN CAST(NULL AS BIGINT) ELSE id END AS k", "id AS v")
      .write.parquet(s"$src/nullkeys.parquet")
    spark.range(0, 10).selectExpr("id + 0.7 AS k", "id AS v")
      .write.parquet(s"$src/frackeys.parquet")
    val out = Files.createTempDirectory("badkeys_out").toString

    val s1 = new TransferEngine(new ParquetSource(src), new ParquetSink(out),
      Some(new CheckpointManager(s"$out/c1.json", "sf", "pq")),
      chunkColumns = Map("nullkeys" -> "k"), chunkCount = 3).transferTable(spark, "nullkeys")
    assert(!s1.success, "NULL chunk keys must fail the transfer")
    assert(s1.errorMessage.exists(_.contains("NULL")), s1.errorMessage)

    val s2 = new TransferEngine(new ParquetSource(src), new ParquetSink(out),
      Some(new CheckpointManager(s"$out/c2.json", "sf", "pq")),
      chunkColumns = Map("frackeys" -> "k"), chunkCount = 3).transferTable(spark, "frackeys")
    assert(!s2.success, "non-integral chunk keys must fail the transfer")
    assert(s2.errorMessage.exists(_.contains("integral")), s2.errorMessage)
  }

  test("decimal(p,0) chunk keys — the JDBC integer-PK type — chunk like longs") {
    // Oracle NUMBER / PG NUMERIC integer PKs surface as DecimalType(p, 0)
    // through JDBC; scale 0 has no fractional values, so chunk-range
    // predicates are exact and the key must be accepted
    val src = Files.createTempDirectory("deckeys_src").toString
    spark.range(0, 100).selectExpr("CAST(id AS DECIMAL(18,0)) AS k", "id * 3 AS v")
      .write.parquet(s"$src/deckeys.parquet")
    val out = Files.createTempDirectory("deckeys_out").toString
    val cp = new CheckpointManager(s"$out/ckpt.json", "sf", "pq")
    val sink = new FlakySink(new ParquetSink(out))
    val s = new TransferEngine(new ParquetSource(src), sink, Some(cp),
      chunkColumns = Map("deckeys" -> "k"), chunkCount = 4).transferTable(spark, "deckeys")
    assert(s.success, s.errorMessage)
    assert(s.rowsTransferred === 100)
    assert(sink.chunkWrites === 4)
    val back = spark.read.parquet(s"$out/deckeys.parquet")
    assert(back.count() === 100)
    assert(back.groupBy("k").count().filter("count > 1").count() === 0)
  }

  test("a decimal chunk key whose values exceed Long range is rejected up front") {
    val src = Files.createTempDirectory("widekeys_src").toString
    spark.sql("SELECT CAST('99999999999999999999' AS DECIMAL(38,0)) AS k, 1 AS v")
      .write.parquet(s"$src/widekeys.parquet")
    val out = Files.createTempDirectory("widekeys_out").toString
    val s = new TransferEngine(new ParquetSource(src), new ParquetSink(out),
      Some(new CheckpointManager(s"$out/c.json", "sf", "pq")),
      chunkColumns = Map("widekeys" -> "k"), chunkCount = 3).transferTable(spark, "widekeys")
    assert(!s.success, "a 20-digit key cannot produce Long chunk boundaries")
    assert(s.errorMessage.exists(_.contains("outside Long range")), s.errorMessage)
  }

  test("unchunked tables keep whole-table semantics; chunked success completes checkpoint") {
    val out = Files.createTempDirectory("chunked2").toString
    val cp = new CheckpointManager(s"$out/ckpt.json", "sf", "pq")
    val sink = new FlakySink(new ParquetSink(out))
    val engine = new TransferEngine(new ParquetSource(sfDir), sink, Some(cp),
      chunkColumns = Map("orders" -> "o_orderkey"), chunkCount = 4)
    val stats = engine.transferSchema(spark, Seq("nation", "orders"))
    assert(stats.forall(_.success))
    assert(sink.chunkWrites == 4) // nation went through write(), orders in 4 chunks
    assert(cp.isCompleted("nation") && cp.isCompleted("orders"))
    assert(cp.resumeOffset("orders") == 0) // completion cleared the watermark
  }
}
