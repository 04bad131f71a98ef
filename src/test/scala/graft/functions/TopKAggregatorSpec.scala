package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec

class TopKAggregatorSpec extends SparkSpec {

  test("top-k aggregate equals window row_number top-k, on any partitioning") {
    import spark.implicits._
    val rnd = new scala.util.Random(7)
    val rows = (1 to 5000).map(_ =>
      (s"g${rnd.nextInt(4)}", s"w${rnd.nextInt(50)}", 1L)).toSeq
    val counts = rows.toDF("g", "w", "one")
      .groupBy("g", "w").agg(sum("one").as("cnt"))

    val expected = {
      import org.apache.spark.sql.expressions.Window
      val win = Window.partitionBy(col("g")).orderBy(col("cnt").desc, col("w"))
      counts.withColumn("rnk", row_number().over(win)).filter(col("rnk") <= 3)
        .select("g", "w", "cnt").collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
    }

    val topk = TopKAggregator.topK(3)
    def viaAgg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("g").agg(topk(col("w"), col("cnt")).as("top"))
        .select(col("g"), explode(col("top")).as("t"))
        .select(col("g"), col("t.item"), col("t.weight")).collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet

    assert(viaAgg(counts) === expected)
    assert(viaAgg(counts.repartition(17)) === expected) // partitioning-independent
  }

  test("buffer never exceeds k") {
    val agg = new TopKAggregator(2)
    val buf = (1 to 10).foldLeft(agg.zero)((b, i) => agg.reduce(b, Weighted(s"x$i", i.toLong)))
    assert(buf.length === 2)
    assert(buf.map(_.weight) === Seq(10L, 9L))
    val merged = agg.merge(buf, Seq(Weighted("y", 100L)))
    assert(merged.length === 2)
    assert(merged.head.weight === 100L)
  }
}
