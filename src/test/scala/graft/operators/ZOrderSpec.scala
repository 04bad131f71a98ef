package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ZOrderSpec extends SparkSpec {

  // 64x64 grid — every (x, y) combination, the cleanest locality testbed
  private lazy val grid = spark.range(64 * 64)
    .selectExpr("id % 64 AS x", "id DIV 64 AS y", "id")
    .cache()

  test("z-values interleave bits exactly") {
    // hand-computed Morton codes: x bits land at even positions, y at odd
    val got = grid.filter(col("id") < 200)
      .withColumn("z", ZOrder.zValue(Seq("x", "y"), bits = 8))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(3)))
    got.foreach { case (x, y, z) =>
      var expected = 0L
      for (i <- 0 until 8)
        expected |= (((x >> i) & 1L) << (2 * i)) | (((y >> i) & 1L) << (2 * i + 1))
      assert(z === expected, s"($x, $y)")
    }
  }

  test("z-clustering bounds BOTH dimensions per partition; 1-d range bounds one") {
    def spans(df: org.apache.spark.sql.DataFrame): (Double, Double) = {
      val rows = df.withColumn("pid", spark_partition_id())
        .groupBy("pid")
        .agg((max("x") - min("x")).as("sx"), (max("y") - min("y")).as("sy"))
        .collect()
      (rows.map(_.getAs[Long]("sx")).sum.toDouble / rows.length,
        rows.map(_.getAs[Long]("sy")).sum.toDouble / rows.length)
    }
    val (zx, zy) = spans(ZOrder.cluster(grid, Seq("x", "y"), bits = 8, partitions = 16))
    val (rx, ry) = spans(grid.repartitionByRange(16, col("x")).sortWithinPartitions("x"))
    info(f"z-order avg span: x=$zx%.1f y=$zy%.1f; 1-d range: x=$rx%.1f y=$ry%.1f")
    // 16 partitions of a 64x64 grid: each z-partition is a ~16x16 block
    // (span ~<= 24 with boundary effects); 1-d range bounds x tightly but
    // leaves y spanning the full 0..63
    assert(zx < 32 && zy < 32, f"z-order failed to localize both dims: $zx%.1f / $zy%.1f")
    assert(ry > 60, f"control broken — 1-d range should leave y unbounded, got $ry%.1f")
    assert(zy < ry / 2, "z-order should bound y far tighter than 1-d range partitioning")
  }

  test("clustered output is range-disjoint on zval across partitions") {
    val parts = ZOrder.cluster(grid, Seq("x", "y"), bits = 8, partitions = 8)
      .select(col("zval"), spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("zval").as("lo"), max("zval").as("hi"))
      .orderBy("lo").collect()
      .map(r => (r.getLong(1), r.getLong(2)))
    parts.sliding(2).foreach {
      case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2, "partition z-ranges overlap")
      case _ =>
    }
  }
}
