package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to hyperplane LSH ([[Similarity.lshNearNeighbors]]):
  *
  *  1. pick `nCentroids` deterministic centroids (hash-sampled corpus rows —
  *     no RNG, no iterative k-means; at 100 TB you'd refine these with a few
  *     Lloyd iterations, same plumbing),
  *  2. one distributed pass assigns every vector to its nearest centroid
  *     (the inverted lists — materialized as a `cluster` column, in
  *     production a partition/bucket key),
  *  3. a query probes only the `nProbe` nearest centroid lists: the
  *     candidate scan shrinks by ~nCentroids/nProbe versus brute force.
  *
  * Centroid dots use the codegen'd `fvec_dot`; the small centroid set rides
  * as a broadcast literal array.
  */
object Ivf {

  /** Deterministic centroid pick: the `n` corpus vectors with the smallest
    * xxhash64(id) — stable under any partitioning, uniform over the corpus. */
  def pickCentroids(corpus: DataFrame, idCol: String, vecCol: String, n: Int): Array[(Long, Seq[Float])] =
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(xxhash64(col(idCol)))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  /** Column: index (0-based) of the centroid with max cosine ≈ max dot for
    * normalized comparison purposes; dot is enough for assignment. */
  private def nearestCentroid(spark: org.apache.spark.sql.SparkSession, vecCol: String,
                              centroids: Array[(Long, Seq[Float])]): Column = {
    GraftFunctions.register(spark)
    val dots = centroids.map { case (_, c) =>
      val litArr = s"array(${c.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
      s"fvec_dot($vecCol, $litArr)"
    }
    expr(s"array_position(array(${dots.mkString(",")}), " +
      s"array_max(array(${dots.mkString(",")}))) - 1")
  }

  /** Assign every corpus vector to its inverted list. */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Array[(Long, Seq[Float])]): DataFrame = {
    val spark = corpus.sparkSession
    corpus.repartition(spark.sparkContext.defaultParallelism)
      .withColumn("cluster", nearestCentroid(spark, vecCol, centroids).cast("int"))
  }

  /** IVF top-k: probe the `nProbe` nearest lists per query, exact cosine
    * within candidates. Queries are broadcast with their probe sets. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spark = corpus.sparkSession
    val centroids = pickCentroids(corpus, "vec_id", "embedding", nCentroids)
    val assigned = assign(corpus, "vec_id", "embedding", centroids)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"), col("cluster"))
      .withColumn("cnorm", sqrt(expr("fvec_dot(cvec, cvec)")))

    val dots = centroids.map { case (_, c) =>
      val litArr = s"array(${c.map(v => s"CAST($v AS FLOAT)").mkString(",")})"
      s"fvec_dot(qvec, $litArr)"
    }
    GraftFunctions.register(spark)
    // probe set: indices of the nProbe largest centroid dots
    val probes = expr(
      s"slice(array_sort(zip_with(array(${dots.mkString(",")}), " +
        s"sequence(0, ${centroids.length - 1}), (d, i) -> struct(-d AS nd, i AS i))), 1, $nProbe).i")
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("probe_clusters", probes)
      .withColumn("qnorm", sqrt(expr("fvec_dot(qvec, qvec)")))
      .withColumn("cluster", explode(col("probe_clusters")))

    val scored = assigned.join(broadcast(q), Seq("cluster"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine",
        expr("fvec_dot(qvec, cvec)") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }
}
