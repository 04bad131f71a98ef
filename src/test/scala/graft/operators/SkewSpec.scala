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

  // ---- round-10: the AQE-vs-salt CROSSOVER, measured (SCALE.md's 100 TB
  // guidance). AQE's OptimizeSkewedJoin splits a hot SHUFFLE PARTITION of
  // a join because join tasks are freely replicable; it has NO equivalent
  // for a skewed non-collapsing aggregation (every row of a key must meet
  // in one task — splitting would be wrong, so no rule exists), and it
  // DECLINES the join split when the join's hash distribution is required
  // downstream (splitting would force a re-shuffle). Those two cases are
  // where the salt stays load-bearing. ----

  test("crossover: a non-collapsing shuffle funnels the hot key into ONE task; salt divides it") {
    // sum/count-class aggregates are immune by construction (map-side
    // combine emits one row per key per map task — pinned via partial_sum
    // in PlanQualitySpec); the exposed shape is the NON-collapsing shuffle
    // (collect_list/distinct-style state, or a repartition by key). Measure
    // the actual row distribution a key-hash shuffle produces:
    def maxPartRows(df: org.apache.spark.sql.DataFrame): Long =
      df.rdd.mapPartitions(it => Iterator(it.size.toLong)).collect().max
    val n = skewed.count() // 10k rows, ~90% on the 'hot' key
    val plainMax = maxPartRows(skewed.repartition(32, col("k")))
    val saltedMax = maxPartRows(
      skewed.withColumn("_salt", pmod(xxhash64(col("id")), lit(8)))
        .repartition(32, col("k"), col("_salt")))
    // raw key shuffle: the hot key's ~9000 rows land in one task — the
    // straggler AQE cannot split (required distribution, not a join)
    assert(plainMax >= (n * 0.85).toLong,
      s"fixture lost its skew: max partition $plainMax of $n")
    // salt factor 8: the hot key spreads over 8 (key,salt) buckets of
    // ~hot/8 rows each; the max TASK can still co-hash a few buckets
    // (observed: 3 of the 8 land together → ~0.34n), so the honest bound
    // is "well under half of plain", not "exactly hot/8" — on a real
    // cluster partitions ≫ buckets and co-hashing vanishes
    assert(saltedMax <= plainMax / 2,
      s"salt failed to spread the hot key: max partition $saltedMax vs plain $plainMax")
    assert(saltedMax <= (n * 0.40).toLong,
      s"salt failed to spread the hot key: max partition $saltedMax of $n")
  }

  test("crossover: AQE declines the skew split when the join feeds a same-key aggregate") {
    // identical skew + thresholds to the firing case above — the ONLY
    // change is draining through groupBy(k), which reuses the join's hash
    // distribution. OptimizeSkewedJoin must decline (splitting the hot
    // partition would break the distribution the aggregate requires and
    // force an extra shuffle), leaving the hot task whole: at 100 TB this
    // exact shape — skewed fact JOIN dim THEN aggregate BY the same key —
    // is where saltedJoin/saltedSumCount remain necessary even with AQE on.
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
      val fact = (1 to 40000).map { i =>
        (if (i % 10 == 0) (i % 89).toLong + 1 else 0L,
          s"row-$i-${i * 2654435761L}-${(i * 40503L) % 65536}")
      }.toDF("k", "payload")
      val dim = (0 to 89).map(k => (k.toLong, s"label-$k-${k * 7919}")).toDF("k", "label")
      val joined = fact.join(dim, Seq("k"))
        .groupBy("k")
        .agg(count(lit(1)).as("cnt"),
          sum(length(concat(col("payload"), col("label")))).as("bytes"))
      val rows = joined.collect()
      assert(rows.map(_.getLong(1)).sum === 40000L)
      val finalPlan = joined.queryExecution.executedPlan.toString
      assert(!finalPlan.split("== Initial Plan ==")(0).contains("skew=true"),
        s"expected AQE to DECLINE the skew split under a same-key aggregate:\n${finalPlan.take(2000)}")
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
