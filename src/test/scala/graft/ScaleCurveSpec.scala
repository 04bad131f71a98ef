package graft

import org.apache.spark.sql.functions._

/** The scale-curve corpus synthesis must grow the corpus WITHOUT growing
  * duplicate density — otherwise the measured exponent reports a property
  * of the synthetic data, not of the pipeline (an m-fold verbatim copy
  * plants m^2 near-dup pairs by construction). */
class ScaleCurveSpec extends SparkSpec {

  private def docs = graft.sources.Tables.load(spark, sfDir, "documents")

  test("synthesized copies are id-disjoint and size-preserving") {
    val base = docs
    val n = base.count()
    val big = ScaleCurve.synthesize(base, 3)
    assert(big.count() == 3 * n)
    assert(big.select("doc_id").distinct().count() == 3 * n)
    // per-copy token counts are preserved (character bijection)
    val tokens = big.select(size(split(col("text"), " ")).as("t"))
      .agg(sum("t")).head.getLong(0)
    val baseTokens = base.select(size(split(col("text"), " ")).as("t"))
      .agg(sum("t")).head.getLong(0)
    assert(tokens == 3 * baseTokens)
  }

  test("copies do not collide: distinct text count scales with the corpus") {
    val base = docs
    val big = ScaleCurve.synthesize(base, 3)
    val baseDistinct = base.select("text").distinct().count()
    val bigDistinct = big.select("text").distinct().count()
    // each copy contributes its own distinct set (rotation is bijective, so
    // per-copy distinct count equals the base's; cross-copy texts differ)
    assert(bigDistinct == 3 * baseDistinct,
      s"expected ${3 * baseDistinct} distinct texts, got $bigDistinct")
  }

  test("duplicate density is constant across scales") {
    val base = docs
    val big = ScaleCurve.synthesize(base, 3)
    def dupFrac(df: org.apache.spark.sql.DataFrame): Double = {
      val total = df.count().toDouble
      val distinct = df.select("text").distinct().count().toDouble
      (total - distinct) / total
    }
    val f1 = dupFrac(base)
    val f3 = dupFrac(big)
    assert(math.abs(f1 - f3) < 1e-9, s"density drifted: $f1 vs $f3")
  }

  test("boilerplate synthesis: 8 template tokens per doc, df<=800 per sentence, copy-disjoint keys") {
    import org.apache.spark.sql.functions._
    val out = ScaleCurve.synthesize(docs, 2, boilerplate = true)
    // every doc gains exactly 8 'bp<key>x<j>' tokens
    val bad = out.filter(
      size(filter(split(col("text"), " "), t => t.startsWith("bp"))) =!= 8)
      .count()
    assert(bad === 0, "every doc must carry exactly 8 boilerplate tokens")
    // sentence membership: each bp key groups <=800 docs, and keys from
    // different copies never collide (id offsets make them disjoint)
    val byKey = out
      .select(col("doc_id"), explode(split(col("text"), " ")).as("t"))
      .filter(col("t").startsWith("bp") && col("t").endsWith("x1"))
      .groupBy("t").agg(countDistinct("doc_id").as("n"),
        countDistinct(floor(col("doc_id") / 100000000L)).as("copies"))
      .collect()
    assert(byKey.nonEmpty)
    byKey.foreach { r =>
      assert(r.getLong(1) <= 800, s"${r.getString(0)} df ${r.getLong(1)} > 800")
      assert(r.getLong(2) === 1L, s"${r.getString(0)} spans copies")
    }
  }
}
