package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-backed file catalog for corpora beyond driver-listing scale
  * (round-10 directive: the SCALE.md known-limit said `Tables`' driver-side
  * listing holds to ~10^6 files and nothing replaced it past that).
  *
  * The manifest is ITSELF a parquet table — one row per data file with the
  * stats a scan planner needs:
  *
  *   `path, table, rows, bytes, min_key, max_key`
  *
  * (`min_key`/`max_key` are the file's min/max of the corpus's pruning
  * column — ingest date, id range, shard key — the same file-level zone map
  * parquet keeps per row group.) At 10^8 files the manifest is a ~10 GB
  * parquet table: reading and FILTERING it is an ordinary distributed scan
  * with predicate pushdown, never a driver-side filesystem walk. Only the
  * paths that SURVIVE pruning are materialized to the driver to build the
  * read — the post-pruning set (a date partition, one table's shard range)
  * is thousands of files where the corpus is millions, which is exactly the
  * regime `spark.read.parquet(paths: _*)` handles. A full-corpus scan
  * (no predicate) should keep using directory paths, where the DISTRIBUTED
  * InMemoryFileIndex listing applies; the manifest's job is making
  * selective reads independent of corpus file count.
  *
  * Reference scope note: the reference reads INFORMATION_SCHEMA for its
  * catalog (`discovery.py:200-248`) — a database does this bookkeeping for
  * it. On a data lake the manifest IS that catalog, so [[rowCount]] is the
  * 100-TB analog of its row-count scan: answered from stats, zero data
  * files touched.
  */
object Manifest {

  /** Canonical column order for a manifest table. */
  val columns: Seq[String] =
    Seq("path", "table", "rows", "bytes", "min_key", "max_key")

  /** Write (or replace) a manifest at `manifestPath` from any DataFrame
    * carrying [[columns]] — typically produced incrementally by the ingest
    * job that wrote the data files (the only moment the stats are free).
    * RANGE-partitioned then sorted by (table, min_key): a local sort alone
    * would leave each output file holding a random key sample (every
    * file's zone map spans the whole range, pruning nothing) — the range
    * exchange is what makes the per-file and per-row-group min/max
    * selective, so a key-range manifest scan skips whole files. */
  def write(entries: DataFrame, manifestPath: String): Unit =
    entries.select(columns.map(col): _*)
      .repartitionByRange(col("table"), col("min_key"))
      .sortWithinPartitions(col("table"), col("min_key"))
      .write.mode("overwrite").parquet(manifestPath)

  /** Build manifest entries for one fixture table directory by scanning it
    * once — the bootstrap path for corpora that predate their manifest.
    * `keyCol` is the pruning column captured into min_key/max_key. */
  def build(spark: SparkSession, dir: String, table: String, keyCol: String): DataFrame = {
    val df = Tables.load(spark, dir, table)
    df.withColumn("path", input_file_name())
      .groupBy(col("path"))
      .agg(count(lit(1)).as("rows"),
        min(col(keyCol)).cast("string").as("min_key"),
        max(col(keyCol)).cast("string").as("max_key"))
      .withColumn("table", lit(table))
      .withColumn("bytes", lit(null).cast("long"))
      .select(columns.map(col): _*)
  }

  /** The pruned manifest slice for a predicate over
    * (table, min_key, max_key) — a DISTRIBUTED filter with parquet
    * pushdown, the step that replaces driver-side listing. Returned as a
    * DataFrame so callers can aggregate stats without touching data. */
  def select(spark: SparkSession, manifestPath: String, pred: Column): DataFrame =
    spark.read.parquet(manifestPath).filter(pred)

  /** Stats-only row count for a slice: answered entirely from the
    * manifest (the INFORMATION_SCHEMA analog — zero data files opened).
    * A slice no file overlaps is 0 rows, not an error (sum over zero
    * rows is SQL NULL — coalesced here). */
  def rowCount(spark: SparkSession, manifestPath: String, pred: Column): Long =
    select(spark, manifestPath, pred)
      .agg(coalesce(sum(col("rows")), lit(0L))).head.getLong(0)

  /** Read the data files surviving `pred`. Only the pruned path set is
    * collected to the driver; the data read itself is an ordinary
    * multi-path parquet scan. A key-range filter (`keyFilter`) should be
    * re-applied on the data because file-level min/max pruning is
    * necessarily coarser than row-level predicates. */
  def read(spark: SparkSession, manifestPath: String, pred: Column,
           keyFilter: Option[Column] = None): DataFrame = {
    val paths = select(spark, manifestPath, pred)
      .select(col("path")).distinct()
      .collect().map(_.getString(0))
    require(paths.nonEmpty, "manifest pruning selected zero files")
    val df = spark.read.parquet(paths.toIndexedSeq: _*)
    keyFilter.fold(df)(df.filter)
  }
}
