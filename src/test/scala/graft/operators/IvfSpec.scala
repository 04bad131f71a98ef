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

  test("Lloyd refinement is monotone: WCSS never increases over iterations") {
    val vecs = emb.select(col("embedding")).collect()
      .map(_.getSeq[Float](0).map(_.toDouble).toArray)
    def wcss(cents: Array[(Long, Seq[Float])]): Double = {
      val cs = cents.map(_._2.map(_.toDouble).toArray)
      vecs.map { v =>
        cs.map { c =>
          var d = 0.0
          var i = 0
          while (i < v.length) { val t = v(i) - c(i); d += t * t; i += 1 }
          d
        }.min
      }.sum
    }
    val initial = Ivf.pickCentroids(emb, "vec_id", "embedding", 8)
    val once = Ivf.refineCentroids(emb, "vec_id", "embedding", initial, iters = 1)
    val twice = Ivf.refineCentroids(emb, "vec_id", "embedding", initial, iters = 2)
    val (w0, w1, w2) = (wcss(initial), wcss(once), wcss(twice))
    info(f"WCSS: initial $w0%.1f -> 1 iter $w1%.1f -> 2 iters $w2%.1f")
    assert(w1 <= w0 * (1 + 1e-9), s"first iteration increased WCSS: $w0 -> $w1")
    assert(w2 <= w1 * (1 + 1e-9), s"second iteration increased WCSS: $w1 -> $w2")
    // refinement must actually move the centroids on this corpus
    assert(w1 < w0)
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
