package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class GlobalIndexSpec extends SparkSpec {

  private lazy val orders = Tables.load(spark, sfDir, "orders")
    .select("o_orderkey", "o_custkey").cache()

  test("numbers equal the single-partition ROW_NUMBER formulation") {
    val w = Window.orderBy(col("o_orderkey"))
    val expected = orders.withColumn("rn", row_number().over(w).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val got = GlobalIndex.withRowNumbers(orders, Seq("o_orderkey"))
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    assert(got === expected)
  }

  test("numbering is input-partitioning-independent and 1-based contiguous") {
    val a = GlobalIndex.withRowNumbers(orders, Seq("o_orderkey"))
      .orderBy("rn").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    val b = GlobalIndex.withRowNumbers(orders.repartition(17), Seq("o_orderkey"))
      .orderBy("rn").collect().map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(a === b)
    assert(a.map(_._2) === (1L to a.length.toLong))
  }

  test("the work stays partition-parallel, never a single-task sort") {
    val df = GlobalIndex.withRowNumbers(orders, Seq("o_orderkey"), partitions = 8)
    assert(df.rdd.getNumPartitions === 8,
      "range repartition collapsed — the whole point is NOT sorting in one task")
  }
}
