package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet-backed table catalog over a scale-factor directory.
  *
  * Mirrors the discovery surface of the reference
  * (`snowflake_to_postgres/discovery.py:200-248`: table listing + column
  * introspection) against local parquet fixtures, Spark-side. Schemas come
  * from parquet footers — never `inferSchema` over text (SURVEY §1.3).
  */
object Tables {
  val all: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Load one fixture table. `events.ts` is written as parquet
    * TIMESTAMP(NANOS), which Spark's vectorized reader surfaces as a long
    * when `spark.sql.legacy.parquet.nanosAsLong` is set — normalize it back
    * to a microsecond TimestampType column so downstream operators see a
    * timestamp, matching what DuckDB sees.
    */
  def load(spark: SparkSession, dir: String, name: String): DataFrame = {
    // Spark's parquet reader rejects TIMESTAMP(NANOS) outright
    // (PARQUET_TYPE_ILLEGAL) unless told to surface it as a raw long.
    scala.util.Try(spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true"))
    val df = spark.read.parquet(path(dir, name))
    df.schema.find(f => f.name == "ts" && f.dataType.typeName == "long") match {
      // integer `div`, not `/`: epoch-nanos (~1.7e18) exceed double's exact
      // range, so float division would drift some timestamps by ±1µs
      case Some(_) => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case None    => df
    }
  }

  // last directory registered per session — registering re-reads all ten
  // parquet footers, which costs ~1s per dialect query when repeated
  private val registered = new java.util.concurrent.ConcurrentHashMap[SparkSession, String]()

  /** Register every fixture table as a temp view (idempotent, cached per
    * session+dir) so dialect-translated SQL can resolve bare table names. */
  def registerAll(spark: SparkSession, dir: String): Unit =
    if (registered.get(spark) != dir) {
      all.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
      registered.put(spark, dir)
    }
}
