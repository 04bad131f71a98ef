package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec

/** Regression pin for the round-6 fixture-regeneration breakage: the driver
  * has shipped `events.ts` as parquet TIMESTAMP(MICROS, adjusted-to-UTC),
  * TIMESTAMP_NTZ (micros, NOT adjusted) and TIMESTAMP(NANOS) across rounds,
  * and `unix_millis` rejects TIMESTAMP_NTZ outright — q19/q39/q101 errored
  * for a whole round. Every ts-consuming query must produce IDENTICAL
  * results under all three encodings of the same instants.
  */
class TsEncodingSpec extends SparkSpec {

  private val tsQueries =
    Seq("q18_window_lag_delta", "q19_sessionize", "q20_events_hourly",
      "q39_asof_join", "q101_scd2_history")

  /** Writes the same little event log under the given ts writer type and
    * returns a fixture dir containing only events.parquet. */
  private def fixture(encoding: String): String = {
    import scala.jdk.CollectionConverters._
    val dir = Files.createTempDirectory(s"graft_tsenc_$encoding").toString
    val base = (0 until 200).map { i =>
      // three users, a session gap every 17th event, two event types
      val ms = 1700000000000L + i * 60000L + (i % 17) * 2400000L
      Row(i.toLong, ms, (i % 3).toLong,
        if (i % 5 == 0) "purchase" else "click", i * 1.5,
        s"""{"k":${i % 7}}""")
    }
    val schema = StructType(Seq(
      StructField("event_id", LongType), StructField("ms", LongType),
      StructField("user_id", LongType), StructField("event_type", StringType),
      StructField("value", DoubleType), StructField("props", StringType)))
    val df = spark.createDataFrame(base.asJava, schema)
    val withTs = encoding match {
      case "ltz" => df.withColumn("ts", timestamp_millis(col("ms")))
      case "ntz" => df.withColumn("ts",
        timestamp_millis(col("ms")).cast(TimestampNTZType))
      case other => sys.error(s"unknown encoding $other")
    }
    withTs.select("event_id", "ts", "user_id", "event_type", "value", "props")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
    dir
  }

  test("ts-consuming queries are identical under LTZ and NTZ parquet encodings") {
    val ltz = fixture("ltz")
    val ntz = fixture("ntz")
    // sanity: the two fixtures really do decode to different Spark types
    assert(spark.read.parquet(s"$ltz/events.parquet").schema("ts").dataType
      === TimestampType)
    assert(spark.read.parquet(s"$ntz/events.parquet").schema("ts").dataType
      === TimestampNTZType)
    for (q <- tsQueries) {
      val a = graft.SparkEntry.queries(q)(spark, ltz)
      val b = graft.SparkEntry.queries(q)(spark, ntz)
      // q20's hour column itself carries the encoding; compare it by instant
      def canon(df: org.apache.spark.sql.DataFrame) = {
        val cols = df.schema.fields.map { f =>
          f.dataType match {
            case TimestampType | TimestampNTZType =>
              unix_millis(col(f.name).cast(TimestampType)).as(f.name)
            case _ => col(f.name)
          }
        }
        df.select(cols.toSeq: _*).collect().map(_.toSeq).sortBy(_.mkString("|"))
      }
      val (ra, rb) = (canon(a), canon(b))
      assert(ra.length === rb.length, s"$q row count differs")
      assert(ra.sameElements(rb), s"$q results differ between encodings")
    }
  }
}
