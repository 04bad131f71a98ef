package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Scale probe: drive the dedup signature+candidate pipeline over a
  * synthetic corpus 200× the sf0.001 fixture (100k documents) — evidence
  * the plan shape (per-row signatures, window-capped bucket join, narrow
  * candidate shuffles) holds when the data is no longer trivial, and a
  * regression tripwire for accidental quadratic behavior. */
class ScaleProbeSpec extends SparkSpec {

  test("minhash candidate pipeline stays linear at 100k synthetic docs") {
    import spark.implicits._
    val n = 100000L
    // ~24-token docs; every 1000th pair is a planted near-duplicate
    val docs = spark.range(n).select(
      col("id").as("doc_id"),
      concat_ws(" ", (0 until 24).map(i =>
        concat(lit(s"w$i"), ((col("id") + i) % when(col("id") % 1000 === 0, 7)
          .otherwise(9999)).cast("string"))): _*).as("text"))
    val t0 = System.nanoTime()
    val pairs = Dedup.minhashNearDups(docs, "doc_id", "text", threshold = 0.5)
    val cnt = pairs.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"100k docs -> $cnt candidate pairs in $secs%.1f s")
    // planted duplicates collide heavily; the run must complete quickly —
    // quadratic candidate generation would take minutes here
    assert(secs < 120.0, f"pipeline took $secs%.1f s — candidate generation regressed")
    val plan = pairs.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
  }

  test("knn graph stays bucket-bounded at 20k synthetic vectors") {
    // 20k 64-dim vectors (10x the sf0.1 embeddings table), deterministic
    // pseudo-random components. The banded-LSH candidate join must stay
    // bucket-bounded: no cartesian, bucket caps in force, and wall time
    // linear-ish — a full pair enumeration would be 400M rescores.
    val vecs = spark.range(20000L).select(
      col("id").as("vec_id"),
      expr("transform(sequence(0, 63), i -> " +
        "CAST((pmod(hash(id * 64 + i), 1000) - 500) / 500.0 AS FLOAT))").as("embedding"))
    val t0 = System.nanoTime()
    val graph = Similarity.knnGraph(vecs, k = 3)
    val cnt = graph.count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"20k vectors -> $cnt knn edges in $secs%.1f s")
    assert(cnt > 0L)
    val plan = graph.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(secs < 120.0, f"knn graph took $secs%.1f s — candidate generation regressed")
  }

  test("connected components converge on 100k clustered pairs in few rounds") {
    // 100k edges over 150k nodes in 50k 3-node clusters (the realistic
    // dedup shape: many small cliquish groups), plus one 64-node chain —
    // the diameter worst case. Label propagation must flood both without
    // iteration blowup or plan-lineage slowdown (localCheckpoint guard).
    val clusters = spark.range(50000L).selectExpr(
      "stack(2, id * 3, id * 3 + 1, id * 3, id * 3 + 2) AS (a_id, b_id)")
    val chainBase = 1000000L
    val chain = spark.range(63L).selectExpr(
      s"id + $chainBase AS a_id", s"id + ${chainBase + 1} AS b_id")
    val t0 = System.nanoTime()
    val labels = Dedup.components(clusters.union(chain)).cache()
    val nClusters = labels.select("label").distinct().count()
    val secs = (System.nanoTime() - t0) / 1e9
    info(f"150k nodes -> $nClusters components in $secs%.1f s")
    assert(nClusters == 50001L) // 50k triangles + 1 chain
    // the chain collapsed to its minimum node despite diameter 63
    val chainLabels = labels.filter(col("node") >= chainBase)
      .select("label").distinct().collect()
    assert(chainLabels.map(_.getLong(0)).toSeq == Seq(chainBase))
    assert(secs < 120.0, f"components took $secs%.1f s — iteration cost regressed")
    labels.unpersist()
  }
}
