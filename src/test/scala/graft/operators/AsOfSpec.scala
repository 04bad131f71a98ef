package graft.operators

import graft.SparkSpec

class AsOfSpec extends SparkSpec {

  test("asof join picks latest right row at or before left time, per key") {
    import spark.implicits._
    val left = Seq(
      (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 5L),
      (4L, "b", 100L), (5L, "c", 50L))
      .toDF("id", "k", "t")
    val right = Seq(
      ("a", 8L, 1.0), ("a", 15L, 2.0), ("a", 20L, 3.0), // ties: inclusive
      ("b", 200L, 9.0)) // only after left's time
      .toDF("k", "t", "v")

    val got = AsOf.asofJoin(left, right, "k", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap

    assert(got(1L) === Some(1.0)) // t=10 → right t=8
    assert(got(2L) === Some(3.0)) // t=20 → inclusive match at t=20
    assert(got(3L) === None)      // t=5 → nothing before
    assert(got(4L) === None)      // right exists but only later
    assert(got(5L) === None)      // key with no right rows
  }

  test("matches a brute-force nested-loop reference on random data") {
    import spark.implicits._
    val rnd = new scala.util.Random(42)
    val left = (1 to 300).map(i =>
      (i.toLong, s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong)).toSeq
    val right = (1 to 200).map(_ =>
      (s"k${rnd.nextInt(5)}", rnd.nextInt(1000).toLong, rnd.nextDouble())).toSeq

    val expected = left.map { case (id, k, t) =>
      val candidates = right.filter(r => r._1 == k && r._2 <= t)
      id -> (if (candidates.isEmpty) None
             else Some(candidates.maxBy(r => (r._2, r._3))._3))
    }.toMap

    // dedup right per (k,t) keeping max v, mirroring the query discipline
    val rightDf = right.toDF("k", "t", "v").groupBy("k", "t")
      .agg(org.apache.spark.sql.functions.max("v").as("v"))
    val got = AsOf.asofJoin(left.toDF("id", "k", "t"), rightDf, "k", "t", Seq("v"))
      .collect().map(r => r.getLong(0) -> Option(r.get(3)).map(_.asInstanceOf[Double]))
      .toMap
    assert(got === expected)
  }

  test("value column sharing a name with a left column does not collide") {
    import spark.implicits._
    val left = Seq((1L, "a", 10L, 99.0)).toDF("id", "k", "t", "v") // left has its own v
    val right = Seq(("a", 5L, 7.0)).toDF("k", "t", "v")
    val row = AsOf.asofJoin(left, right, "k", "t", Seq("v")).collect()(0)
    assert(row.getDouble(3) === 99.0) // left's own v intact
    assert(row.getDouble(4) === 7.0)  // asof_v from right
  }
}
