package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** Approximate aggregates (SURVEY §2.4 notes them absent in the reference,
  * free in Spark): HLL distinct-count within its error bound, and
  * approx_percentile sanity against exact quantiles. */
class ApproxSpec extends SparkSpec {

  test("approx_count_distinct lands within 5% of exact on lineitem keys") {
    val li = Tables.load(spark, sfDir, "lineitem")
    val row = li.agg(
      countDistinct(col("l_orderkey")).as("exact"),
      approx_count_distinct(col("l_orderkey"), 0.02).as("approx")).collect()(0)
    val exact = row.getLong(0).toDouble
    val approx = row.getLong(1).toDouble
    assert(math.abs(approx - exact) / exact < 0.05,
      s"approx=$approx exact=$exact")
  }

  test("approx_percentile brackets the exact median") {
    val o = Tables.load(spark, sfDir, "orders")
    val approxMedian = o.agg(
      percentile_approx(col("o_totalprice"), lit(0.5), lit(1000))).collect()(0).getDouble(0)
    val sorted = o.select("o_totalprice").orderBy("o_totalprice")
      .collect().map(_.getDouble(0))
    val exactMedian = sorted(sorted.length / 2)
    assert(math.abs(approxMedian - exactMedian) / exactMedian < 0.02,
      s"approx=$approxMedian exact=$exactMedian")
  }
}
