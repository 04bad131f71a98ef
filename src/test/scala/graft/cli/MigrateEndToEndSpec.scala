package graft.cli

import java.nio.file.{Files, Paths}

import graft.SparkSpec

/** SURVEY §5.4 end-to-end: migrate the whole fixture schema, then run the
  * validation suite over every table expecting pass; corrupt one table and
  * expect exactly that table to fail. */
class MigrateEndToEndSpec extends SparkSpec {

  private def runCli(args: String*): (Int, Seq[String]) = {
    val buf = Seq.newBuilder[String]
    val code = Main.run(args.toArray, spark, s => buf += s)
    (code, buf.result())
  }

  test("migrate all tables → DDL emitted, data copied, all validations pass") {
    val dst = Files.createTempDirectory("migrate_e2e").toString

    val (mcode, mout) = runCli("migrate", "--source", sfDir, "--target", dst,
      "--schema", "tpch", "--workers", "4")
    assert(mcode === 0, mout)
    assert(Files.exists(Paths.get(dst, "_schema.sql")))
    val ddl = new String(Files.readAllBytes(Paths.get(dst, "_schema.sql")))
    assert(ddl.contains("CREATE TABLE \"tpch\".\"lineitem\""))
    assert(mout.count(_.contains("OK")) === 10, "all 10 tables transferred")

    val (vcode, vout) = runCli("validate", "--source", sfDir, "--target", dst)
    assert(vcode === 0, vout.filter(_.contains("FAIL")))
    assert(vout.count(_.endsWith(": PASS")) === 10)

    // corrupt one table: drop some rows from orders
    val corrupted = spark.read.parquet(s"$dst/orders.parquet")
      .filter("o_orderkey % 10 != 0")
    corrupted.write.mode("overwrite").parquet(s"$dst/orders_tmp.parquet")
    // replace atomically enough for the test
    import scala.sys.process._
    Seq("rm", "-rf", s"$dst/orders.parquet").!
    Seq("mv", s"$dst/orders_tmp.parquet", s"$dst/orders.parquet").!

    val (ccode, cout) = runCli("validate", "--source", sfDir, "--target", dst)
    assert(ccode === 1)
    assert(cout.exists(_.startsWith("orders: FAIL")))
    assert(cout.count(_.endsWith(": PASS")) === 9, "only orders should fail")
  }
}
