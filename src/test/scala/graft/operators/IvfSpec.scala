package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

class IvfSpec extends SparkSpec {

  private lazy val emb = Tables.load(spark, sfDir, "embeddings").cache()

  test("centroid pick is deterministic and partitioning-independent") {
    val a = Ivf.pickCentroids(emb, "vec_id", "embedding", 8).map(_._1).toSeq
    val b = Ivf.pickCentroids(emb.repartition(13), "vec_id", "embedding", 8).map(_._1).toSeq
    assert(a === b)
    assert(a.distinct.length === 8)
  }

  test("assignment covers every vector with a valid cluster id") {
    val centroids = Ivf.pickCentroids(emb, "vec_id", "embedding", 8)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", centroids)
    assert(assigned.count() === emb.count())
    val clusters = assigned.select("cluster").distinct()
      .collect().map(_.getInt(0)).toSet
    assert(clusters.subsetOf((0 until 8).toSet))
    assert(clusters.size > 1, "degenerate clustering: everything in one list")
  }

  test("IVF top-k achieves reasonable recall vs brute force at nProbe=4/16") {
    val queries = emb.filter(col("vec_id") < 10)
    val exact = Similarity.bruteForceTopK(emb, queries, k = 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Ivf.topK(emb, queries, k = 5, nCentroids = 16, nProbe = 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = exact.intersect(ivf).size.toDouble / exact.size
    // random 64-d vectors are a worst case for IVF; the structural guarantee
    // is candidate-set reduction with nonzero overlap, not high recall
    assert(recall > 0.15, s"recall=$recall")
    assert(ivf.size === exact.size)
  }

  test("IVF scans fewer candidates than brute force") {
    val queries = emb.filter(col("vec_id") < 10)
    val centroids = Ivf.pickCentroids(emb, "vec_id", "embedding", 16)
    val assigned = Ivf.assign(emb, "vec_id", "embedding", centroids)
    val clusterSizes = assigned.groupBy("cluster").count()
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val total = clusterSizes.values.sum
    val maxProbed = clusterSizes.values.toSeq.sorted.reverse.take(4).sum
    assert(maxProbed < total, s"probing everything: $maxProbed of $total")
  }
}
