package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Manifest-backed catalog for corpora beyond driver-listing scale
  * (round-10 directive): 10^4 manifest entries flow through the
  * DISTRIBUTED pruning path — a parquet scan with pushed filters, pinned
  * here — and only the surviving handful of real files is ever opened.
  * The synthetic 9,990 entries point at paths that DO NOT EXIST, so any
  * listing/read outside the pruned set fails the suite by construction. */
class ManifestSpec extends SparkSpec {

  private val base = Files.createTempDirectory("graft_manifest").toString

  test("10^4-entry manifest prunes distributively; only surviving files are read") {
    import spark.implicits._

    // 10 REAL data files: key ranges [d*100, d*100+99], 50 rows each
    val dataDir = s"$base/data"
    (0 until 10).foreach { d =>
      (0 until 50).map(i => (d * 100 + i * 2, s"v${d}_$i"))
        .toDF("k", "v")
        .coalesce(1).write.mode("overwrite").parquet(s"$dataDir/shard$d")
    }
    val realEntries = (0 until 10).map { d =>
      val dir = new java.io.File(s"$dataDir/shard$d")
      val f = dir.listFiles().filter(_.getName.endsWith(".parquet")).head
      (f.getAbsolutePath, "docs", 50L, f.length(),
        f"${d * 100}%06d", f"${d * 100 + 98}%06d")
    }
    // 9,990 SYNTHETIC entries: nonexistent paths, key ranges disjoint from
    // every real shard (offset by 10^6) — pruning must drop all of them
    val synthetic = (0 until 9990).map { i =>
      (s"/nonexistent/corpus/f$i.parquet", "docs", 1000L, 1L << 20,
        f"${1000000 + i * 100}%09d", f"${1000000 + i * 100 + 99}%09d")
    }
    val manifestPath = s"$base/manifest"
    Manifest.write(
      (realEntries ++ synthetic)
        .toDF("path", "table", "rows", "bytes", "min_key", "max_key")
        .repartition(8),
      manifestPath)

    // predicate: table + key-range overlap for keys [000200, 000399]
    // (shards 2 and 3) — file-level zone-map semantics
    val pred = col("table") === "docs" &&
      col("min_key") <= "000399" && col("max_key") >= "000200"

    // pruning is a DISTRIBUTED parquet scan with the predicate pushed —
    // the pin that says "this is a scan plan, not a driver loop"
    val pruned = Manifest.select(spark, manifestPath, pred)
    val plan = pruned.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(plan.contains("PushedFilters"), plan.take(800))
    assert(plan.matches("(?s).*PushedFilters: \\[.*min_key.*\\].*") ||
      plan.matches("(?s).*PushedFilters: \\[.*max_key.*\\].*"),
      "key-range predicate did not reach the manifest scan")

    val survivors = pruned.select("path").as[String].collect()
    assert(survivors.length === 2)
    assert(survivors.forall(p => p.contains("shard2") || p.contains("shard3")))

    // stats-only count: answered from the manifest, zero data files opened
    assert(Manifest.rowCount(spark, manifestPath, pred) === 100L)

    // the data read opens ONLY the pruned files (nonexistent synthetic
    // paths would throw) and re-applies the row-level key filter
    val got = Manifest.read(spark, manifestPath, pred,
      keyFilter = Some(col("k").between(200, 399)))
    assert(got.count() === 100L)
    assert(got.agg(min("k"), max("k")).head.toSeq === Seq(200, 398))

    // zero-survivor predicates: stats answer 0, data read fails loudly
    // instead of listing a corpus
    val none = col("table") === "docs" && col("min_key") >= "999999990"
    assert(Manifest.rowCount(spark, manifestPath, none) === 0L)
    val e = intercept[IllegalArgumentException](
      Manifest.read(spark, manifestPath, none))
    assert(e.getMessage.contains("zero files"))
  }

  test("build() bootstraps a manifest from an existing fixture table") {
    val entries = Manifest.build(spark, sfDir, "orders", "o_orderdate")
    val rows = entries.collect()
    assert(rows.nonEmpty)
    val total = rows.map(_.getAs[Long]("rows")).sum
    assert(total === spark.read.parquet(s"$sfDir/orders.parquet").count())
    // every entry carries a usable zone map
    assert(rows.forall(r => r.getAs[String]("min_key") <= r.getAs[String]("max_key")))
    // round-trip: written manifest answers the full-table count from stats
    val mp = s"$base/orders_manifest"
    Manifest.write(entries, mp)
    assert(Manifest.rowCount(spark, mp, col("table") === "orders") === total)
  }

  override def afterAll(): Unit = {
    org.apache.commons.io.FileUtils.deleteQuietly(new java.io.File(base))
    super.afterAll()
  }
}
