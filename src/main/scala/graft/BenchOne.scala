package graft

import org.apache.spark.sql.SparkSession

/** Local iteration harness: time a comma-separated subset of
  * [[SparkEntry.queries]] with the same session config / drain / repetition
  * discipline as [[Bench]], without paying for the whole roster.
  *
  * Usage: `sbt "runMain graft.BenchOne q118_perplexity_gate[,q66...] [sfDir]"`
  */
object BenchOne {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(',').toSeq
    val sfDir = args.lift(1).getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try SparkEntry.queries.get("q01_pricing_summary")
      .foreach(q => Measure.drain(q(spark, sfDir)))
    catch { case _: Throwable => () }
    names.foreach { raw =>
      val name = SparkEntry.queries.keys.find(_.startsWith(raw)).getOrElse(raw)
      val fn = SparkEntry.queries(name)
      val samples = (1 to 3).map { _ =>
        spark.catalog.clearCache()
        val t0 = System.nanoTime()
        Measure.drain(fn(spark, sfDir))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"BENCHONE $name%-28s median=${samples.sorted.apply(1)}%.3f runs=${samples.map(s => f"$s%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
