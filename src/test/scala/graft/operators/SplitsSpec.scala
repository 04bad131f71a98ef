package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SplitsSpec extends SparkSpec {

  test("splitLabel: deterministic md5 buckets near 90/5/5") {
    import spark.implicits._
    val ids = spark.range(0, 20000).toDF("id")
    val labeled = ids.select(Splits.splitLabel(col("id")).as("split"))
    val counts = labeled.groupBy("split").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.88 && counts("train") / n < 0.92, counts)
    assert(counts("val") / n > 0.035 && counts("val") / n < 0.065, counts)
    assert(counts("test") / n > 0.035 && counts("test") / n < 0.065, counts)
    // re-evaluation yields identical assignments (pure function of the key)
    val again = ids.select(col("id"), Splits.splitLabel(col("id")).as("s1"))
      .withColumn("s2", Splits.splitLabel(col("id")))
    assert(again.filter(col("s1") =!= col("s2")).count() === 0L)
  }

  test("clusterSplitCensus: clusters never straddle; naive split leaks") {
    import spark.implicits._
    // 300 duplicate pairs with far-apart ids (independent md5 buckets) +
    // 100 singletons; ~10% of pairs should straddle a naive boundary
    val pairs = (0L until 300L).flatMap(i => Seq((i, s"dup text $i"), (i + 10000L, s"dup text $i")))
    val singles = (20000L until 20100L).map(i => (i, s"unique text $i"))
    val docs = (pairs ++ singles).toDF("doc_id", "text")

    val census = Splits.clusterSplitCensus(docs, "doc_id", "text").collect()
    assert(census.map(_.getLong(2)).sum === 700L) // every doc counted once
    assert(census.map(_.getLong(1)).sum === 400L) // 300 pair + 100 single clusters
    // a naive per-doc split provably tears some dup pairs apart
    assert(census.map(_.getLong(3)).sum > 0L, census.mkString(", "))

    // the semantic guarantee: assigning every member its cluster rep's
    // split leaves each content hash entirely inside one split
    val reps = docs.groupBy(md5(col("text").cast("binary")).as("ch"))
      .agg(min(col("doc_id")).as("rep"))
    val assigned = docs.select(md5(col("text").cast("binary")).as("ch"), col("doc_id"))
      .join(reps, "ch")
      .select(col("ch"), Splits.splitLabel(col("rep")).as("split"))
    val straddling = assigned.groupBy("ch")
      .agg(countDistinct("split").as("k")).filter(col("k") > 1).count()
    assert(straddling === 0L)
  }

  test("splitLabelSql mirrors splitLabel thresholds") {
    // the Scala and SQL forms share the exact threshold constants; pin the
    // SQL text so an edit to one side cannot silently diverge
    val sql = Splits.splitLabelSql("doc_id")
    assert(sql.contains("< 'e6'") && sql.contains("< 'f3'"))
    assert(sql.contains("md5(CAST(doc_id AS VARCHAR))"))
  }
}
