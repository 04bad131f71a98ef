package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for training-data pipelines. All
  * "randomness" is content-hash order (md5), so samples are reproducible
  * across runs, partitionings, and engines — `rand()`-based sampling can't
  * be validated cross-engine and isn't retry-stable at scale.
  */
object Sampling {

  /** Per-stratum top-n by hash order: a balanced sample with exactly
    * min(n, |stratum|) rows per key. One window shuffle on the stratum key. */
  def stratified(df: DataFrame, stratumCol: String, hashCol: String, n: Int): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(md5(col(hashCol).cast("binary")), col(hashCol))
    df.withColumn("_rank", row_number().over(w))
      .filter(col("_rank") <= n)
      .drop("_rank")
  }

  /** Weighted mixture sampling: keep a row iff the first 4 hex chars of its
    * content hash fall under the stratum's weight threshold — an
    * embarrassingly-parallel Bernoulli sample with deterministic membership
    * (expected rate = weight, exact across engines since it's a plain string
    * comparison). Rows whose stratum has no weight are dropped. */
  def mixture(df: DataFrame, stratumCol: String, hashCol: String,
              weights: Map[String, Double]): DataFrame = {
    val thresholds = weights.map { case (k, w) =>
      k -> hexThreshold(w)
    }
    val thresholdCol = thresholds.foldLeft(lit(null).cast("string")) {
      case (acc, (k, thr)) => when(col(stratumCol) === k, lit(thr)).otherwise(acc)
    }
    df.withColumn("_thr", thresholdCol)
      .filter(col("_thr").isNotNull &&
        substring(md5(col(hashCol).cast("binary")), 1, 4) < col("_thr"))
      .drop("_thr")
  }

  /** 4-hex-digit threshold for a weight in [0,1]: floor(w * 16^4) as hex. */
  def hexThreshold(w: Double): String =
    f"${math.min(math.max((w * 65536).toInt, 0), 65535)}%04x"

  /** Quality-weighted Bernoulli sampling: per-ROW keep probability (vs
    * [[mixture]]'s per-stratum constant) — how corpora are actually
    * downsampled (keep rate rises with document quality). Membership =
    * 32-bit content-hash integer < floor(rate · 2³²): deterministic under
    * any partitioning, replayable in SQL as
    * `('0x'||substr(md5(x),1,8))::BIGINT < floor(rate * 4294967296)`.
    * `rateCol` is clamped to [0,1]. */
  def qualityWeighted(df: DataFrame, hashCol: String, rateCol: Column): DataFrame =
    df.withColumn("_h",
        conv(substring(md5(col(hashCol).cast("binary")), 1, 8), 16, 10).cast("long"))
      .withColumn("_thr",
        floor(least(greatest(rateCol, lit(0.0)), lit(1.0)) * lit(4294967296.0)).cast("long"))
      .filter(col("_h") < col("_thr"))
      .drop("_h", "_thr")

  /** Deterministic temperature-weighted epoch manifest: the materialized
    * training ORDER of a mixed corpus. Each source's docs are ranked in
    * content-hash order, and doc r of source s is scheduled at key
    * `(r − 0.5) / sqrt(share_s)` — stride scheduling: walking keys
    * ascending interleaves sources in proportion to their α = 0.5
    * temperature weights (the low-resource up-weighting of q86), with no
    * randomness, so the order is identical across runs, partitionings, and
    * engines, and a resumed job can seek to a position instead of
    * re-shuffling. The head of the manifest (`topN`) is the report; a full
    * epoch materialization is the same plan with the limit dropped (one
    * range-exchange sort — the cost IS the operator).
    *
    * Determinism: rank is an exact int; share is one division; sqrt is
    * IEEE-correctly-rounded in both engines; one more division yields the
    * key — bit-identical doubles, no libm beyond sqrt. Scale shape: one
    * window shuffle keyed by source (rank), broadcast source counts, and a
    * TakeOrdered heap for the head — no global sort until a full epoch is
    * actually materialized.
    */
  def epochManifest(docs: DataFrame, idCol: String, sourceCol: String,
                    topN: Int = 100): DataFrame = {
    val w = Window.partitionBy(col("source"))
      .orderBy(md5(col("doc_id").cast("string").cast("binary")), col("doc_id"))
    val counts = docs.groupBy(col(sourceCol).as("source")).agg(count(lit(1)).as("n_s"))
    val tot = counts.agg(sum(col("n_s")).as("n_total"))
    docs.select(col(idCol).as("doc_id"), col(sourceCol).as("source"))
      .join(broadcast(counts), Seq("source"))
      .crossJoin(broadcast(tot))
      .withColumn("rank_in_source", row_number().over(w))
      .withColumn("pos_key",
        (col("rank_in_source").cast("double") - lit(0.5)) /
          sqrt(col("n_s").cast("double") / col("n_total").cast("double")))
      .select(col("pos_key"), col("source"), col("doc_id"), col("rank_in_source"))
      .orderBy(col("pos_key"), col("source"), col("doc_id"))
      .limit(topN)
  }
}
