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

  test("AQE OptimizeSkewedJoin fires on a skewed fact join (runtime re-plan)") {
    // SCALE.md's J-family 100x claim leans on AQE splitting a hot-key
    // partition at runtime; this pins that the mechanism actually engages.
    // Thresholds are lowered so a test-sized hot partition counts as
    // skewed; broadcast is disabled so the join stays sort-merge (the only
    // shape OptimizeSkewedJoin rewrites).
    val keys = Seq(
      "spark.sql.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.autoBroadcastJoinThreshold",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes",
      "spark.sql.adaptive.coalescePartitions.enabled")
    val saved = keys.map(k =>
      k -> scala.util.Try(spark.conf.get(k)).toOption.filter(_ != null))
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
      spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
      spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
      // fact: 40k rows, ~90% on key 0, incompressible-ish varied padding so
      // the hot shuffle partition's byte size clears the lowered threshold
      val fact = (1 to 40000).map { i =>
        (if (i % 10 == 0) (i % 89).toLong + 1 else 0L,
          s"row-$i-${i * 2654435761L}-${(i * 40503L) % 65536}")
      }.toDF("k", "payload")
      val dim = (0 to 89).map(k => (k.toLong, s"label-$k-${k * 7919}")).toDF("k", "label")
      // two constraints for the rewrite to engage: (1) the aggregate must
      // CONSUME payload/label, or column pruning strips them before the
      // exchange and the hot partition compresses below any threshold;
      // (2) the drain must be a GLOBAL aggregate — a groupBy on the join
      // key would reuse the join's hash partitioning downstream, and
      // OptimizeSkewedJoin declines rewrites that break a required
      // distribution (splitting would force an extra shuffle)
      val joined = fact.join(dim, Seq("k"))
        .agg(count(lit(1)).as("cnt"),
          sum(length(concat(col("payload"), col("label")))).as("bytes"))
      val row = joined.collect().head
      // correctness first: every fact row matched exactly one dim row
      assert(row.getLong(0) === 40000L)
      assert(row.getLong(1) > 0L)
      // the runtime plan must carry the skew-split sort-merge join
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(finalPlan.contains("skew=true"),
        s"OptimizeSkewedJoin did not fire:\n${finalPlan.take(2000)}")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("salting actually spreads the hot key over multiple partitions") {
    val saltCount = skewed
      .withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
      .filter(col("k") === "hot")
      .select("_salt").distinct().count()
    assert(saltCount === 8L)
  }
}
