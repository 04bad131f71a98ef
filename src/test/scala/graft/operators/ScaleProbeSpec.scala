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
}
