package graft.streaming

import java.nio.file.Files

import graft.SparkSpec

/** Rolling ingestion must enforce one invariant whatever the micro-batch
  * boundaries: no accepted document near-duplicates an earlier-accepted
  * one, and every novel document survives. The scenario plants a dup of
  * the seed corpus in one batch and a dup ACROSS batches (a later file
  * repeating an earlier file's novel text) — the cross-batch kill only
  * works because survivors are appended to the corpus between batches. */
class IngestStreamSpec extends SparkSpec {

  test("streamed ingestion dedups each batch against seed + earlier survivors") {
    import spark.implicits._
    // the suite session is shared across specs — start from a clean cache
    // manager so the trailing isEmpty assertion sees only THIS test's leaks
    spark.catalog.clearCache()
    val x = "the quick brown fox jumps over the lazy dog again and again"
    val y = "spark catalyst plans every join shuffle and broadcast carefully"
    val z = "novel prose that the seed corpus has never seen before today"
    val w = "another entirely fresh document completing the final batch here"

    val corpusDir = Files.createTempDirectory("ingest_corpus").toString + "/docs"
    val srcDir = Files.createTempDirectory("ingest_src").toString
    val ckpt = Files.createTempDirectory("ingest_ckpt").toString

    val seed = Seq((1L, x), (2L, y)).toDF("doc_id", "text")
    seed.write.parquet(corpusDir)

    // two source files -> two micro-batches (maxFilesPerTrigger=1):
    // 10 duplicates the seed, 20 duplicates 11 (the other batch's novelty)
    Seq((10L, x), (11L, z)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/b1")
    Seq((20L, z), (21L, w)).toDF("doc_id", "text")
      .coalesce(1).write.parquet(s"$srcDir/b2")

    val incoming = spark.readStream.schema(seed.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
    val q = IngestStream.dedupIngest(incoming, corpusDir, ckpt, threshold = 0.9)
    q.awaitTermination()

    val fin = spark.read.parquet(corpusDir).collect()
      .map(r => (r.getLong(0), r.getString(1)))
    // one survivor per distinct text, nothing lost: whichever z arrived in
    // the earlier-processed batch killed the other; the x rerun died to
    // the seed; both batches' novelties landed
    assert(fin.length === 4, fin.sortBy(_._1).mkString("; "))
    assert(fin.map(_._2).toSet === Set(x, y, z, w))
    assert(fin.count(_._2 == z) === 1)
    // and the ingestion left no cached frames behind (scope-released)
    assert(spark.sharedState.cacheManager.isEmpty)
  }

  test("manifestCompactEvery rewrites the append-fragmented catalog on schedule") {
    import org.apache.spark.sql.functions.col
    import graft.sources.Manifest
    import spark.implicits._
    val corpusDir = Files.createTempDirectory("ingest_cp_corpus").toString + "/docs"
    val srcDir = Files.createTempDirectory("ingest_cp_src").toString
    val ckpt = Files.createTempDirectory("ingest_cp_ckpt").toString
    val mp = Files.createTempDirectory("ingest_cp").toString + "/manifest"
    val seed = Seq((1L, "seed document one of the corpus")).toDF("doc_id", "text")
    seed.coalesce(1).write.parquet(corpusDir)
    Manifest.updateDir(spark, corpusDir, "docs", Seq("doc_id"), mp)
    Seq((10L, "first streamed batch entirely novel text"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/b1")
    Seq((20L, "second streamed batch also completely new prose"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/b2")
    val incoming = spark.readStream.schema(seed.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
    // compact on every 2nd batch: batchId 1 triggers the rewrite
    IngestStream.dedupIngest(incoming, corpusDir, ckpt, threshold = 0.9,
      manifestPath = Some(mp), manifestCompactEvery = 2).awaitTermination()
    // the catalog was rewritten by ONE job (every part file carries the
    // same writer UUID — three separate appends would carry three) and
    // lost nothing
    val writerIds = spark.read.parquet(mp).inputFiles
      .map(_.split("/").last.replaceAll("^part-\\d+-", "")).toSet
    assert(writerIds.size === 1,
      s"compaction must leave a single-job layout, got $writerIds")
    assert(Manifest.rowCount(spark, mp, col("table") === "docs") ===
      spark.read.parquet(corpusDir).count())
    assert(spark.read.parquet(mp).select("path").as[String].collect().toSet ===
      spark.read.parquet(corpusDir).inputFiles.toSet)
  }

  test("per-batch manifest maintenance tracks the growing corpus without rescan") {
    import org.apache.spark.sql.functions.col
    import graft.sources.Manifest
    import spark.implicits._
    val corpusDir = Files.createTempDirectory("ingest_mf_corpus").toString + "/docs"
    val srcDir = Files.createTempDirectory("ingest_mf_src").toString
    val ckpt = Files.createTempDirectory("ingest_mf_ckpt").toString
    val mp = Files.createTempDirectory("ingest_mf").toString + "/manifest"

    val seed = Seq((1L, "seed document one of the corpus"),
      (2L, "seed document two of the corpus")).toDF("doc_id", "text")
    seed.coalesce(1).write.parquet(corpusDir)
    // bootstrap the catalog over the seed; its rows must survive every
    // later batch UNTOUCHED — the proof no batch rescanned old files
    Manifest.updateDir(spark, corpusDir, "docs", Seq("doc_id"), mp)
    val seedRows = spark.read.parquet(mp).collect().toSet
    assert(Manifest.rowCount(spark, mp, col("table") === "docs") === 2L)

    // two micro-batches of novel docs (maxFilesPerTrigger=1)
    Seq((10L, "first streamed batch entirely novel text"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/b1")
    Seq((20L, "second streamed batch also completely new prose"))
      .toDF("doc_id", "text").coalesce(1).write.parquet(s"$srcDir/b2")
    val incoming = spark.readStream.schema(seed.schema)
      .option("maxFilesPerTrigger", "1").parquet(s"$srcDir/*")
    IngestStream.dedupIngest(incoming, corpusDir, ckpt, threshold = 0.9,
      manifestPath = Some(mp)).awaitTermination()

    // the catalog tracked both batches: stats-only count equals the data,
    // one manifest row per part file, seed rows byte-identical
    val after = spark.read.parquet(mp).collect().toSet
    assert(seedRows.subsetOf(after), "seed manifest rows must be untouched")
    assert(Manifest.rowCount(spark, mp, col("table") === "docs") ===
      spark.read.parquet(corpusDir).count())
    assert(after.map(_.getAs[String]("path")) ===
      spark.read.parquet(corpusDir).inputFiles.toSet)
    // typed doc_id zone maps answer a ranged stats question
    assert(Manifest.rowCount(spark, mp,
      col("table") === "docs" && Manifest.overlaps("doc_id", 10L, 99L)) === 2L)
  }
}
