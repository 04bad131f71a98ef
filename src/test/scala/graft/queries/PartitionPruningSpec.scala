package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Partition-layout evidence for the 100 TB design: a table written
  * partitioned by a date-derived key is read back with partition PRUNING —
  * the scan touches only the selected partition directories, which is what
  * keeps a year-scoped query on a 100 TB fact table from reading 100 TB. */
class PartitionPruningSpec extends SparkSpec {

  test("year-partitioned write prunes to one partition on read") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part").toString
    val orders = graft.sources.Tables.load(spark, sfDir, "orders")
      .withColumn("o_year", year(col("o_orderdate")))
    orders.write.mode("overwrite").partitionBy("o_year").parquet(dir)

    val years = orders.select(col("o_year")).distinct().collect().map(_.getInt(0)).sorted
    assert(years.length > 1, "fixture should span multiple years")

    val one = spark.read.parquet(dir).filter(col("o_year") === years.head)
    val plan = one.queryExecution.executedPlan.toString
    // the filter must land in PartitionFilters (directory pruning), not as
    // a post-scan data filter
    assert(plan.contains("PartitionFilters") && plan.matches("(?s).*PartitionFilters: \\[.*o_year.*\\].*"),
      s"year filter did not reach PartitionFilters:\n${plan.take(1500)}")
    // and the pruned count matches the unpartitioned filter
    assert(one.count() == orders.filter(col("o_year") === years.head).count())

    // files actually scanned = only the one partition directory
    val scannedParts = one.select(input_file_name()).distinct().collect()
      .map(_.getString(0)).map(f => f.split("/").find(_.startsWith("o_year=")).getOrElse(""))
    assert(scannedParts.toSet == Set(s"o_year=${years.head}"),
      s"scanned beyond the pruned partition: ${scannedParts.toSet}")
  }
}
