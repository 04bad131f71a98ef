package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SkewSpec extends SparkSpec {

  import spark.implicits._

  // power-law key distribution: one key holds ~90% of rows
  private lazy val skewed = (1 to 10000).map { i =>
    (if (i % 10 == 0) s"k${i % 7}" else "hot", i.toLong, i.toDouble)
  }.toDF("k", "id", "v").cache()

  test("salted sum/count equals plain groupBy on skewed data") {
    val plain = skewed.groupBy("k")
      .agg(sum("v").as("sum_v"), count(lit(1)).as("cnt"))
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    val salted = Skew.saltedSumCount(skewed, "k", "v", saltFactor = 8, saltBy = "id")
      .collect().map(r => (r.getString(0), r.getDouble(1), r.getLong(2))).toSet
    assert(salted === plain)
  }

  test("salted join equals plain join on skewed data") {
    val dim = Seq(("hot", "H"), ("k0", "A"), ("k3", "B")).toDF("k", "label")
    val plain = skewed.join(dim, Seq("k"))
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    val salted = Skew.saltedJoin(skewed, dim, "k", saltFactor = 8, saltBy = "id")
      .select("id", "label").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(salted === plain)
    assert(plain.nonEmpty)
  }

  test("salting actually spreads the hot key over multiple partitions") {
    val saltCount = skewed
      .withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
      .filter(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(saltCount === 8L)
  }
}
