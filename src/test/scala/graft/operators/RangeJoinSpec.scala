package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RangeJoinSpec extends SparkSpec {

  import spark.implicits._

  test("bucketed range join equals the naive theta join, overlapping intervals included") {
    val rnd = new scala.util.Random(11)
    val points = (1 to 2000).map(i => (i.toLong, rnd.nextDouble() * 1000)).toSeq
    val intervals = (1 to 40).map { i =>
      val lo = rnd.nextDouble() * 900
      (i.toLong, lo, lo + rnd.nextDouble() * 200) // overlapping, varied width
    }.toSeq
    val pdf = points.toDF("pid", "p")
    val idf = intervals.toDF("iid", "lo", "hi")

    val naive = pdf.crossJoin(idf)
      .filter(col("p") >= col("lo") && col("p") < col("hi"))
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val bucketed = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", bucketWidth = 50.0)
      .select("pid", "iid").collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(bucketed === naive)
    assert(naive.nonEmpty)
  }

  test("boundary semantics: lo inclusive, hi exclusive") {
    val pdf = Seq((1L, 10.0), (2L, 20.0)).toDF("pid", "p")
    val idf = Seq((1L, 10.0, 20.0)).toDF("iid", "lo", "hi")
    val got = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", 5.0)
      .select("pid").collect().map(_.getLong(0)).toSeq
    assert(got === Seq(1L))
  }

  test("no cartesian product in the physical plan") {
    val pdf = Seq((1L, 10.0)).toDF("pid", "p")
    val idf = Seq((1L, 0.0, 100.0)).toDF("iid", "lo", "hi")
    val joined = RangeJoin.pointInInterval(pdf, "p", idf, "lo", "hi", 10.0)
    joined.collect()
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
