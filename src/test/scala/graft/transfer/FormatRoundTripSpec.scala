package graft.transfer

import java.nio.file.Files

import graft.SparkSpec

class FormatRoundTripSpec extends SparkSpec {

  private def tmp() = Files.createTempDirectory("fmt").toString

  test("parquet -> orc -> back preserves rows and schema exactly") {
    val dir = tmp()
    val src = new ParquetSource(sfDir.stripSuffix("/"))
    val orig = spark.read.parquet(s"$sfDir/orders.parquet")
    new OrcSink(dir).write(orig, "orders")
    val back = new OrcSource(dir).read(spark, "orders")
    assert(back.schema === orig.schema)
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
    assert(new OrcSink(dir).countRows(spark, "orders") === Some(orig.count()))
    val viaEngine = new TransferEngine(src, new OrcSink(dir))
      .transferTable(spark, "nation")
    assert(viaEngine.success && viaEngine.rowsTransferred === 25)
  }

  test("orc chunked append overwrites on first chunk, appends after") {
    val dir = tmp()
    val df = spark.range(10).toDF("id")
    val sink = new OrcSink(dir)
    sink.writeChunk(df, "t", firstChunk = true)
    sink.writeChunk(df, "t", firstChunk = false)
    assert(new OrcSource(dir).read(spark, "t").count() === 20)
    sink.writeChunk(df, "t", firstChunk = true) // fresh run clears leftovers
    assert(new OrcSource(dir).read(spark, "t").count() === 10)
  }

  test("jsonl round-trips the long/double/string/timestamp core") {
    import org.apache.spark.sql.functions._
    val dir = tmp()
    val orig = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate"))
    new JsonLinesSink(dir).write(orig, "orders")
    val back = new JsonLinesSource(dir).read(spark, "orders")
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"),
        col("o_orderdate"))
    assert(back.except(orig).isEmpty && orig.except(back).isEmpty)
  }

  test("jsonl gzip shards read back complete") {
    val dir = tmp()
    val df = spark.range(1000).toDF("id")
    new JsonLinesSink(dir, gzip = true).write(df, "t")
    assert(new JsonLinesSource(dir).read(spark, "t").count() === 1000)
  }
}
