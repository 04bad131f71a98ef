package graft.operators

import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.SparkSpec
import graft.sources.Tables

class PqSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  test("codebooks are deterministic and shaped m x k x dims/m") {
    val a = Pq.codebooks(emb, "vec_id", "embedding")
    val b = Pq.codebooks(emb.repartition(13), "vec_id", "embedding")
    assert(a.length === 8)
    assert(a.forall(_.length === 128))
    assert(a.forall(_.forall(_.length === 8))) // 64 dims / 8 subspaces
    assert(a.map(_.map(_.toSeq).toSeq).toSeq === b.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("encoding is partitioning-independent and codes are in range") {
    val cbs = Pq.codebooks(emb, "vec_id", "embedding")
    def codes(df: org.apache.spark.sql.DataFrame) =
      Pq.encode(df, "embedding", cbs).select("vec_id", "codes")
        .orderBy("vec_id").collect().map(r => r.getLong(0) -> r.getSeq[Int](1)).toSeq
    val a = codes(emb)
    assert(a === codes(emb.repartition(7)))
    assert(a.forall(_._2.forall(c => c >= 0 && c < 128)))
    assert(a.forall(_._2.length === 8))
  }

  test("a codebook row encodes to itself (zero quantization error)") {
    // each codebook entry came from a corpus vector: that vector's nearest
    // sub-centroid in every subspace is its own slice, so its ADC score
    // against itself equals its exact scaled self-dot
    graft.functions.GraftFunctions.register(spark)
    val cbs = Pq.codebooks(emb, "vec_id", "embedding")
    val cbIds = Ivf.pickCentroids(emb, "vec_id", "embedding", 128).map(_._1)
    val self = Pq.encode(emb.filter(col("vec_id").isin(cbIds: _*)), "embedding", cbs)
      .withColumn("adc", Pq.adcScore(col("embedding"), col("codes"), cbs))
      .withColumn("exact", Similarity.scaledDot("embedding", "embedding"))
    assert(self.filter(col("adc") =!= col("exact")).count() === 0)
  }

  test("ADC top-k recalls a solid fraction of the exact-dot top-k") {
    // ADC approximates the raw dot (codes can't see query norms), so the
    // honest comparable is the exact scaled-dot ranking, not cosine
    graft.functions.GraftFunctions.register(spark)
    val queries = emb.filter(col("vec_id") < 10)
    val pq = Pq.topK(emb, queries, k = 5)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val w = Window.partitionBy(col("qid")).orderBy(col("d").desc, col("cid"))
    val exact = emb.select(col("vec_id").as("cid"), col("embedding").as("cvec"))
      .join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("d", Similarity.scaledDot("qvec", "cvec"))
      .withColumn("rank", row_number().over(w)).filter(col("rank") <= 5)
      .select(col("qid"), col("cid")).collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (pq intersect exact).size.toDouble / exact.size
    info(f"PQ recall@5 vs exact dot: $recall%.2f")
    // near-isotropic synthetic vectors are PQ's worst case, and the
    // codebooks are sampling-trained (no Lloyd) — demand a floor well above
    // chance (5/499 ~ 0.01), not perfection
    assert(recall >= 0.3, f"recall collapsed: $recall%.2f")
  }

  test("the scoring join broadcasts the query side") {
    val df = Pq.topK(emb, emb.filter(col("vec_id") < 3), k = 3)
    df.collect()
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") || plan.contains("BroadcastHashJoin"),
      plan.take(2000))
  }
}
