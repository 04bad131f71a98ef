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

  test("written files are skippable on the SECOND clustered column via footer min/max stats") {
    // the q88 claim, completed: not just "partitions are local" but "a
    // reader pruning on parquet footer statistics — what Spark's row-group
    // filter, Delta and Iceberg all do — skips most files for a filter on
    // the SECOND clustered column". The control layout (1-d range on x)
    // leaves y unbounded in every file, so it can never skip on y.
    import scala.jdk.CollectionConverters._
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile

    // per-file [min, max] of `column`, read from the parquet FOOTER — the
    // exact metadata a stats-pruning reader consults, no data pages touched
    def fileRange(file: java.io.File, column: String): (Long, Long) = {
      val reader = ParquetFileReader.open(HadoopInputFile.fromPath(
        new Path(file.getPath), spark.sparkContext.hadoopConfiguration))
      try {
        val stats = reader.getFooter.getBlocks.asScala.flatMap { b =>
          b.getColumns.asScala.find(_.getPath.toDotString == column).map(_.getStatistics)
        }
        assert(stats.nonEmpty && stats.forall(s => s.hasNonNullValue),
          s"footer carries no $column stats — nothing to prune on")
        (stats.map(_.genericGetMin.asInstanceOf[java.lang.Long].longValue).min,
          stats.map(_.genericGetMax.asInstanceOf[java.lang.Long].longValue).max)
      } finally reader.close()
    }

    def surviving(dir: String, y: Long): (Int, Int) = {
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      val ranges = files.map(fileRange(_, "y"))
      (ranges.count { case (mn, mx) => mn <= y && y <= mx }, files.length)
    }

    val zdir = java.nio.file.Files.createTempDirectory("graft_zorder").toString
    val xdir = java.nio.file.Files.createTempDirectory("graft_xrange").toString
    ZOrder.cluster(grid, Seq("x", "y"), bits = 8, partitions = 16)
      .write.mode("overwrite").parquet(zdir)
    grid.repartitionByRange(16, col("x")).sortWithinPartitions("x")
      .write.mode("overwrite").parquet(xdir)

    val (zKept, zTotal) = surviving(zdir, y = 5)
    val (xKept, xTotal) = surviving(xdir, y = 5)
    info(s"y=5 candidate files — z-order: $zKept/$zTotal, 1-d x-range: $xKept/$xTotal")
    assert(zTotal >= 8 && xTotal >= 8, "expected one file per range partition")
    // z-order: most files' y-stats exclude the value — a stats reader skips them
    assert(zKept <= zTotal / 2,
      s"z-order layout should let min/max stats skip most files on y, kept $zKept/$zTotal")
    // control: 1-d x clustering leaves y spanning ~0..63 in every file
    assert(xKept == xTotal,
      "control broken — 1-d x layout should make every file a y-candidate")
    // and pruning loses nothing: reading with the filter still finds all rows
    assert(spark.read.parquet(zdir).filter(col("y") === 5).count() === 64)
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
