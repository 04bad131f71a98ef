package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** IVF (inverted-file) approximate nearest neighbor — the second scale path
  * next to hyperplane LSH ([[Similarity.lshNearNeighbors]]):
  *
  *  1. pick `nCentroids` deterministic centroids (md5-hash-sampled corpus
  *     rows — no RNG, no iterative k-means; at 100 TB you'd refine these
  *     with a few Lloyd iterations, same plumbing),
  *  2. one distributed pass assigns every vector to its nearest centroid
  *     (the inverted lists — materialized as a `cluster` column, in
  *     production a partition/bucket key),
  *  3. a query probes only the `nProbe` nearest centroid lists: the
  *     candidate scan shrinks by ~nCentroids/nProbe versus brute force.
  *
  * Determinism: centroid order (md5 of the id), assignment and ranking
  * (scaled-exact dots, [[Similarity.scaledDot]] — codegen'd long loops,
  * order-independent) are all bit-replayable by the DuckDB oracle. The
  * small centroid set rides as a broadcast literal array.
  */
object Ivf {

  /** Deterministic centroid pick: the `n` corpus vectors with the smallest
    * md5(id) hex — stable under any partitioning, uniform over the corpus,
    * and replayable as `ORDER BY md5(CAST(id AS VARCHAR)), id` in SQL. */
  def pickCentroids(corpus: DataFrame, idCol: String, vecCol: String, n: Int): Array[(Long, Seq[Float])] =
    corpus.select(col(idCol).cast("long"), col(vecCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
      .limit(n)
      .collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1)))

  private def centArrays(centroids: Array[(Long, Seq[Float])]): Array[Array[Float]] =
    centroids.map(_._2.toArray)

  /** Assign every corpus vector to its inverted list via the native
    * [[graft.functions.FvecNearestIndex]] expression (centroids ride as a
    * codegen reference object — ties resolve to the first index, matching
    * `ROW_NUMBER() OVER (ORDER BY dot DESC, idx)` = 1 in the oracle). */
  def assign(corpus: DataFrame, idCol: String, vecCol: String,
             centroids: Array[(Long, Seq[Float])],
             nProbe: Int = 4): DataFrame = {
    val spark = corpus.sparkSession
    corpus.repartition(spark.sparkContext.defaultParallelism)
      .withColumn("cluster", graft.functions.GraftFunctions.ivfNearest(
        col(vecCol), centArrays(centroids), Similarity.ScaledShift))
  }

  /** Lloyd refinement of the hash-sampled centroids — the "few k-means
    * iterations" the 100 TB path would run on the same plumbing: one
    * distributed Euclidean-assignment pass (`ivf_nearest_euclid`: argmin
    * ‖v-c‖² as a biased max-dot, constants as reference objects), then a
    * per-(cluster, dim) mean via posexplode + groupBy — shuffle size
    * #clusters × dims rows, independent of corpus size. Empty clusters
    * keep their previous centroid. */
  def refineCentroids(corpus: DataFrame, idCol: String, vecCol: String,
                      centroids: Array[(Long, Seq[Float])],
                      iters: Int = 2): Array[(Long, Seq[Float])] = {
    var cents = centroids
    for (_ <- 0 until iters) {
      val means = corpus
        .withColumn("cluster", graft.functions.GraftFunctions.ivfNearestEuclid(
          col(vecCol), centArrays(cents), Similarity.ScaledShift))
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("dim", "x")))
        .groupBy(col("cluster"), col("dim"))
        .agg(avg(col("x")).as("m"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case ((id, old), cIdx) =>
        byCluster.get(cIdx) match {
          case Some(rows) =>
            val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
            (id, old.indices.map(d => dims.getOrElse(d, old(d).toDouble).toFloat))
          case None => (id, old)
        }
      }
    }
    cents
  }

  /** Oracle-replayable k-means census — the corpus topic-clustering report
    * (SemDeDup / domain-discovery both start from exactly this step): md5-
    * ordered deterministic seeds, `iters` exact Lloyd iterations, then a
    * per-cluster quality rollup (size, mean/min member cosine to the final
    * centroid). Low mean cosine = a diffuse topic; tiny clusters = likely
    * outlier pockets worth a curation look.
    *
    * Determinism (every step bit-replayable in DuckDB):
    *  - seeds: smallest-md5 corpus rows ([[pickCentroids]]),
    *  - assignment: argmin ‖v−c‖² as the biased scaled-integer max-dot
    *    ([[graft.functions.GraftFunctions.ivfNearestEuclid]]; ties → lowest
    *    centroid index = `ROW_NUMBER() OVER (ORDER BY score DESC, cidx)`),
    *  - new centroids: per-(cluster, dim) DECIMAL(38,18)-exact means of the
    *    float values, rounded to float BEFORE the next assignment so both
    *    engines feed identical numbers to the same integer formula
    *    (the [[Similarity.labelCentroidQuality]] discipline, iterated),
    *  - empty clusters keep their previous centroid.
    *
    * Scale shape: each iteration is ONE corpus pass — the assignment is a
    * codegen'd per-row expression (centroids ride as a reference object),
    * and the per-dim mean shuffles k×dims rows regardless of corpus size.
    * The k×dims driver round-trip per iteration is the same bounded state
    * [[pickCentroids]] already pays; nothing corpus-sized leaves executors. */
  def kmeansCensus(corpus: DataFrame, idCol: String, vecCol: String,
                   k: Int = 8, iters: Int = 2): DataFrame = {
    import org.apache.spark.sql.types.DecimalType
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val seeds = pickCentroids(corpus, idCol, vecCol, k)
    var cents: Array[Array[Float]] = seeds.map(_._2.toArray)
    // NOT fanned out (round-17 measurement): each Lloyd iteration is its
    // own action, so a fan-out exchange would be re-paid per iteration —
    // measured 0.90 → 1.14 s. The per-iteration work is k×dims-bounded
    // anyway once the posexplode collapses map-side.
    val c = corpus.select(col(idCol), col(vecCol))
    for (_ <- 0 until iters) {
      val means = c
        .withColumn("cluster", graft.functions.GraftFunctions.ivfNearestEuclid(
          col(vecCol), cents, Similarity.ScaledShift))
        .select(col("cluster"), posexplode(col(vecCol)).as(Seq("pos", "v")))
        .groupBy(col("cluster"), col("pos"))
        .agg((sum(col("v").cast("double").cast(DecimalType(38, 18))).cast("double") /
          count(lit(1))).as("c"))
        .collect()
      val byCluster = means.groupBy(_.getInt(0))
      cents = cents.zipWithIndex.map { case (old, cIdx) =>
        byCluster.get(cIdx) match {
          case Some(rows) =>
            val dims = rows.map(r => r.getInt(1) -> r.getDouble(2)).toMap
            Array.tabulate(old.length)(d => dims.getOrElse(d, old(d).toDouble).toFloat)
          case None => old
        }
      }
    }
    val spark = corpus.sparkSession
    import spark.implicits._
    val centDf = cents.toSeq.zipWithIndex
      .map { case (cent, i) => (i, seeds(i)._1, cent.toSeq) }
      .toDF("cluster", "seed_id", "centroid")
    c
      .withColumn("cluster", graft.functions.GraftFunctions.ivfNearestEuclid(
        col(vecCol), cents, Similarity.ScaledShift))
      .join(broadcast(centDf), Seq("cluster"))
      .select(col("cluster"), col("seed_id"),
        (Similarity.scaledDot(vecCol, "centroid").cast("double") /
          (Similarity.scaledNorm(vecCol) * Similarity.scaledNorm("centroid"))).as("cosine"))
      .groupBy(col("cluster"), col("seed_id"))
      .agg(count(lit(1)).as("n_members"),
        (sum(col("cosine").cast(DecimalType(38, 18))).cast("double") /
          count(lit(1))).as("mean_cosine"),
        min(col("cosine")).as("min_cosine"))
      .orderBy(col("cluster"))
  }

  /** DuckDB fragment for the Euclidean-assignment score: scaled dot minus
    * half the scaled centroid self-dot — the same longs
    * [[graft.functions.GraftFunctions.ivfNearestEuclid]] compares (`//` is
    * integer division; the self-dot is non-negative so trunc == floor ==
    * the Scala `Long / 2`). */
  def euclidScoreSql(vec: String, cent: String): String =
    s"(${Similarity.scaledDotSql(vec, cent)} - ${Similarity.scaledDotSql(cent, cent)} // 2)"

  /** IVF top-k: probe the `nProbe` nearest lists per query, exact cosine
    * within candidates. Queries are broadcast with their probe sets. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           nCentroids: Int = 16, nProbe: Int = 4): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // scaledDot/scaledNorm resolve fvec_scaled_dot from the session
    // registry — register defensively for fresh sessions
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    val centroids = pickCentroids(corpus, "vec_id", "embedding", nCentroids)
    val assigned = assign(corpus, "vec_id", "embedding", centroids, nProbe)
      .select(col("vec_id").as("cid"), col("embedding").as("cvec"), col("cluster"))
      .withColumn("cnorm", Similarity.scaledNorm("cvec"))

    // probe set: indices of the nProbe largest centroid dots
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("probe_clusters", graft.functions.GraftFunctions.ivfProbes(
        col("qvec"), centArrays(centroids), nProbe, Similarity.ScaledShift))
      .withColumn("qnorm", Similarity.scaledNorm("qvec"))
      .withColumn("cluster", explode(col("probe_clusters")))

    val scored = assigned.join(broadcast(q), Seq("cluster"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("cosine",
        Similarity.scaledDot("qvec", "cvec").cast("double") / (col("qnorm") * col("cnorm")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cosine").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("cosine"), col("rank"))
  }
}
