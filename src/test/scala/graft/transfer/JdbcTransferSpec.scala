package graft.transfer

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real JDBC round-trips against embedded Derby (the one JDBC engine
  * available offline): sink → source equality, WHERE pushdown reaching the
  * JDBC scan, and partitioned parallel reads — upgrading the S1-S4/S2
  * coverage rows from compile-level to executed. */
class JdbcTransferSpec extends SparkSpec {

  private val url = "jdbc:derby:memory:graftdb;create=true"
  private val opts = Map("driver" -> "org.apache.derby.jdbc.EmbeddedDriver")

  private def nation = graft.sources.Tables.load(spark, sfDir, "nation")

  test("JDBC sink then source round-trips a table exactly") {
    new JdbcSink(url, opts).write(nation, "nation_rt")
    val back = new JdbcSource(url, opts).read(spark, "nation_rt")
    assert(back.count() == nation.count())
    val a = nation.collect().map(_.toSeq).toSet
    val b = back.collect().map(_.toSeq).toSet
    assert(a == b)
  }

  test("filter pushdown reaches the JDBC scan") {
    new JdbcSink(url, opts).write(nation, "nation_push")
    val engine = new TransferEngine(
      new JdbcSource(url, opts), new ParquetSink(tmpDir("jdbc_push_out")),
      where = Some("n_regionkey = 2"))
    val stats = engine.transferTable(spark, "nation_push")
    assert(stats.success && stats.rowsTransferred ==
      nation.filter(col("n_regionkey") === 2).count())
    // the predicate must appear as a pushed filter in the JDBC scan plan
    val df = new JdbcSource(url, opts).read(spark, "nation_push")
      .filter(col("n_regionkey") === 2)
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("EqualTo(n_regionkey,2)"),
      s"no pushed filter in plan:\n$plan")
  }

  test("partitioned JDBC read splits into numPartitions tasks") {
    new JdbcSink(url, opts).write(nation, "nation_part")
    val src = new JdbcSource(url, opts,
      partitionColumn = Some("n_nationkey"), bounds = Some((0L, 24L)), numPartitions = 4)
    val df = src.read(spark, "nation_part")
    assert(df.rdd.getNumPartitions == 4)
    assert(df.count() == nation.count())
  }

  private def tmpDir(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(name)
    d.toFile.deleteOnExit()
    d.toString
  }
}
