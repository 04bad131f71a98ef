package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Bucketing = pre-partitioning for co-located joins — the scale technique
  * that removes the shuffle from repeated fact-fact joins entirely. This
  * spec proves the mechanics: bucketed tables joined on the bucket key plan
  * ZERO shuffle exchanges, where the plain parquet join needs two.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed join on the bucket key plans no shuffle exchange") {
    val wh = Files.createTempDirectory("bucketwh").toString
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")

    Tables.load(spark, sfDir, "orders")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/b_orders").saveAsTable("b_orders")
    Tables.load(spark, sfDir, "lineitem")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/b_lineitem").saveAsTable("b_lineitem")

    // co-located join: bucket key = join key on both sides. Disable
    // auto-broadcast so the test exercises the shuffle-or-not decision a
    // large-scale join would face (fixture tables are broadcast-small).
    val oldThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    val (plan, bucketed) = try {
      val joined = spark.table("b_lineitem")
        .join(spark.table("b_orders"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus"))
        .agg(count(lit(1)).as("cnt"))
      val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      (joined.queryExecution.executedPlan.toString, rows)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", oldThreshold)

    // the join itself must not introduce an Exchange on either side
    val joinSection = plan.split("HashAggregate").last
    assert(joinSection.contains("SortMergeJoin") || joinSection.contains("ShuffledHashJoin"),
      s"expected a join in:\n$plan")
    assert(!joinSection.contains("Exchange hashpartitioning"),
      s"bucketed join still shuffles:\n$plan")

    // sanity: result matches the plain parquet join
    val plain = Tables.load(spark, sfDir, "lineitem")
      .join(Tables.load(spark, sfDir, "orders"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderstatus")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bucketed === plain)

    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
  }
}
