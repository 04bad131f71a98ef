package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.graft.ColumnBridge

/** Product quantization (PQ) — the memory-compression scale path for ANN
  * serving, completing the similarity-search family (brute force → LSH →
  * IVF → int8 → PQ):
  *
  *  1. split each `dims`-dim vector into `m` subvectors,
  *  2. per subspace, learn a tiny codebook (`kCodes` entries — here the
  *     md5-hash-sampled corpus rows of [[Ivf.pickCentroids]], sliced; at
  *     100 TB you'd Lloyd-refine per subspace with [[Ivf.refineCentroids]]'s
  *     plumbing),
  *  3. encode every corpus vector as `m` small code indices — 64 floats
  *     (256 bytes) become 8 codes (8 bytes here, m·log2(k) bits in general):
  *     the corpus index fits in a fraction of the memory, which is the
  *     difference between serving from RAM and thrashing at corpus scale,
  *  4. queries score candidates with the asymmetric distance computation
  *     (ADC): dot(q, decode(codes)) = Σ_j dot(q_j, codebook_j[code_j]) —
  *     per query a k×m lookup table replaces every per-candidate float
  *     multiply. In production ADC composes with IVF probing (scan only the
  *     probed lists' codes); here the full-scan form keeps the operator
  *     oracle-checkable end to end.
  *
  * Determinism: encoding reuses the scaled-Euclidean argmin expression
  * ([[graft.functions.GraftFunctions.ivfNearestEuclid]], ties → lowest
  * code) and ADC sums scaled-long dots ([[Similarity.ScaledShift]]), so
  * codes AND scores replay bit-for-bit in the DuckDB oracle.
  */
object Pq {

  /** Per-subspace codebooks (`m × kCodes × dims/m`), sliced from the
    * `kCodes` md5-picked corpus vectors — deterministic, partition-stable,
    * and SQL-replayable (`ORDER BY md5(CAST(id AS VARCHAR)), id`). */
  def codebooks(corpus: DataFrame, idCol: String, vecCol: String,
                m: Int = 8, kCodes: Int = 128): Array[Array[Array[Float]]] =
    codebooksFrom(Ivf.pickCentroids(corpus, idCol, vecCol, kCodes), m)

  /** Slice already-picked md5-ordered rows into per-subspace codebooks —
    * lets one corpus pick serve both the IVF centroid set (its prefix)
    * and the PQ codebooks in [[ivfPqTopK]]. */
  def codebooksFrom(rows: Array[(Long, Seq[Float])], m: Int): Array[Array[Array[Float]]] = {
    val dims = rows.head._2.length
    require(dims % m == 0, s"dims=$dims not divisible into $m subspaces")
    val sub = dims / m
    Array.tabulate(m)(j => rows.map(_._2.slice(j * sub, (j + 1) * sub).toArray))
  }

  /** Adds a `codes` column (`array<int>`, length m): per subspace the
    * nearest sub-centroid under scaled Euclidean distance — one codegen'd
    * argmin per subspace, no explode, no shuffle. */
  def encode(df: DataFrame, vecCol: String, cbs: Array[Array[Array[Float]]]): DataFrame = {
    val sub = cbs(0)(0).length
    val codes = cbs.indices.map { j =>
      graft.functions.GraftFunctions.ivfNearestEuclid(
        slice(col(vecCol), j * sub + 1, sub), cbs(j), Similarity.ScaledShift)
    }
    df.withColumn("codes", array(codes: _*))
  }

  /** ADC score of a full-precision query against a codes column — one
    * native expression with the m×k×sub codebooks as a codegen reference
    * object. (The first version composed `element_at` over nested literal
    * arrays, which embedded all m·k·sub floats in the plan — seconds of
    * Janino compile per query and a plan too fat to ship to tasks, exactly
    * the anti-pattern the ANN expressions exist to avoid.) */
  def adcScore(qvec: Column, codes: Column, cbs: Array[Array[Array[Float]]]): Column =
    ColumnBridge.column(graft.functions.PqAdcScore(
      ColumnBridge.expression(qvec), ColumnBridge.expression(codes),
      cbs, Similarity.ScaledShift))

  /** The production serving composition: IVF probing × PQ compression.
    * The index is `(id, cluster, codes)` — cluster prunes WHICH rows a
    * query touches (nProbe/nCentroids of the corpus; at scale the cluster
    * column is the partition key, so probing is partition-pruned I/O), PQ
    * codes shrink WHAT each touched row costs (8 bytes vs 256). Each
    * stage is the same deterministic machinery as its standalone query
    * (q41 probing, q83 ADC), so the composed operator still replays
    * bit-for-bit in the oracle. */
  def ivfPqTopK(corpus: DataFrame, queries: DataFrame, k: Int,
                nCentroids: Int = 16, nProbe: Int = 4,
                m: Int = 8, kCodes: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    graft.functions.GraftFunctions.register(corpus.sparkSession)
    // one md5-ordered pick serves both: the centroid set is a prefix of
    // the codebook rows (identical ordering), so the corpus is scanned
    // once, not twice, for the two constant sets
    val picked = Ivf.pickCentroids(corpus, "vec_id", "embedding", math.max(nCentroids, kCodes))
    val centroids = picked.take(nCentroids)
    val cents = centroids.map(_._2.toArray)
    val cbs = codebooksFrom(picked.take(kCodes), m)
    // NOT fanned out (round-17 measurement): the assign+encode work here is
    // ~150 ms serial and the fan-out's tiny 32-way tasks cost more than
    // they save (0.44 → 0.82 s measured) — unlike topK below, whose
    // single-task ADC scoring pass is 4× heavier
    val index = encode(
      Ivf.assign(corpus, "vec_id", "embedding", centroids), "embedding", cbs)
      .select(col("vec_id").as("cid"), col("cluster"), col("codes"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
      .withColumn("cluster", explode(graft.functions.GraftFunctions.ivfProbes(
        col("qvec"), cents, nProbe, Similarity.ScaledShift)))
    val scored = index.join(broadcast(q), Seq("cluster"))
      .filter(col("cid") =!= col("qid"))
      .withColumn("adc", adcScore(col("qvec"), col("codes"), cbs))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("adc"), col("rank"))
  }

  /** PQ top-k: encode the corpus once, broadcast the (small) query set,
    * rank candidates by ADC score. The corpus side carries only
    * `(id, codes)` — the compressed index — through the scoring join. */
  def topK(corpus: DataFrame, queries: DataFrame, k: Int,
           m: Int = 8, kCodes: Int = 128): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cbs = codebooks(corpus, "vec_id", "embedding", m, kCodes)
    // fan a narrow corpus scan out before the per-row PQ encode + ADC
    // scoring (CPU-heavy); no-op on a real multi-split corpus
    val enc = encode(Par.fanOutIfNarrow(
        corpus.select(col("vec_id"), col("embedding"))), "embedding", cbs)
      .select(col("vec_id").as("cid"), col("codes"))
    val q = queries.select(col("vec_id").as("qid"), col("embedding").as("qvec"))
    val scored = enc.join(broadcast(q), col("cid") =!= col("qid"))
      .withColumn("adc", adcScore(col("qvec"), col("codes"), cbs))
    val w = Window.partitionBy(col("qid")).orderBy(col("adc").desc, col("cid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("cid"), col("adc"), col("rank"))
  }
}
