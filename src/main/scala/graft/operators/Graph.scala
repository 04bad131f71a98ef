package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Iterative graph analytics over edge DataFrames. Companion to the
  * connected-components loop in [[Dedup]]: components answer "which docs
  * are the same", PageRank answers "which docs are central" — the
  * graph-centrality quality signal over a KNN/similarity graph (a
  * SemDeDup-style pipeline keeps the highest-centrality representative of
  * each near-dup neighborhood rather than an arbitrary member).
  */
object Graph {

  /** Damped PageRank with a FIXED iteration count, engineered for
    * cross-engine replay: per-edge contributions `pr(src)/outdeg(src)` are
    * single correctly-rounded divisions, each rounds to DECIMAL(38,18)
    * before the exact per-node sum (accumulation-order-proof), and the
    * damping update `(1-d)/N + d·s` is straight-line double arithmetic —
    * so every iteration's scores are bit-identical in Spark and DuckDB and
    * the final top-k cut is deterministic.
    *
    * Dangling nodes (no out-edges) leak their mass — the conventional
    * simplification for a relevance REPORT (both engines leak identically);
    * redistribute before using scores as true probabilities.
    *
    * Scale shape: rank state is one row per node; each iteration is one
    * src-keyed broadcast-or-shuffle join plus one dst-keyed partial
    * aggregate — identical to the pointer-jumping loop's cost model. The
    * iteration count is a constant (default 3), so plan depth is bounded;
    * for tens of iterations on a 100 TB graph, `localCheckpoint` each
    * round the way [[Dedup.clusters]] does.
    *
    * @param nodes one column `id` (every vertex, edge-less ones included)
    * @param edges columns `src`, `dst` (directed)
    */
  def pageRank(nodes: DataFrame, edges: DataFrame,
               iters: Int = 3, damping: Double = 0.85): DataFrame = {
    val n1 = nodes.agg(count(lit(1)).as("n_total"))
    val outdeg = edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val base = nodes.crossJoin(broadcast(n1))
    var ranks = base.select(col("id"), col("n_total"),
      (lit(1.0) / col("n_total")).as("pr"))
    var i = 0
    while (i < iters) {
      val contrib = edges
        .join(outdeg, Seq("src"))
        .join(ranks.select(col("id").as("src"), col("pr")), Seq("src"))
        .select(col("dst").as("id"),
          (col("pr") / col("outdeg")).cast(DecimalType(38, 18)).as("c"))
        .groupBy(col("id"))
        .agg(sum(col("c")).as("s"))
      ranks = base
        .join(contrib, Seq("id"), "left_outer")
        .select(col("id"), col("n_total"),
          (lit(1.0 - damping) / col("n_total") +
            lit(damping) * coalesce(col("s"), lit(0)).cast("double")).as("pr"))
      i += 1
    }
    ranks
      .join(outdeg.withColumnRenamed("src", "id"), Seq("id"), "left_outer")
      .select(col("id"), col("pr").as("pagerank"),
        coalesce(col("outdeg"), lit(0L)).as("n_out"))
  }
}
