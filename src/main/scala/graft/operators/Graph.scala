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
               iters: Int = 3, damping: Double = 0.85,
               scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // the edge frame is consumed once per iteration plus the final
    // degree join — when it is an LSH/KNN pipeline output (q113), the
    // uncached plan re-runs that whole pipeline iters+2 times
    val e = scope.cached(edges)
    val n1 = nodes.agg(count(lit(1)).as("n_total"))
    val outdeg = scope.cached(
      e.groupBy(col("src")).agg(count(lit(1)).as("outdeg")))
    val base = nodes.crossJoin(broadcast(n1))
    var ranks = base.select(col("id"), col("n_total"),
      (lit(1.0) / col("n_total")).as("pr"))
    var i = 0
    while (i < iters) {
      val contrib = e
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

  /** Synchronous label propagation (Raghavan et al. 2007) with a FIXED
    * iteration count and deterministic tie-break: each round every node
    * adopts its neighbors' most frequent label, ties to the SMALLEST
    * label, isolated nodes keep their own. Detects dense communities the
    * connected-components view can't separate (components merge through
    * any single bridge edge; LPA keeps weakly-bridged cliques apart) —
    * the finer-grained SemDeDup neighborhood structure.
    *
    * Determinism: frequency + min-label argmax via one row_number window
    * per round — no randomized update order (the classic async variant is
    * run-dependent; this synchronous form replays bit-for-bit in DuckDB).
    * Scale shape per round: one dst-keyed join (label attach), one
    * (node, label) aggregate, one node-partitioned window — all
    * hash-partitioned by node id, state one row per node.
    *
    * @param nodes one column `id`
    * @param edges columns `src`, `dst` (made undirected internally)
    */
  def labelPropagation(nodes: DataFrame, edges: DataFrame,
                       iters: Int = 3,
                       scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // cached: the undirected edge list is re-joined every round, and the
    // incoming edges frame is often an LSH/KNN pipeline (q178)
    val und = scope.cached(edges.select(col("src"), col("dst"))
      .unionAll(edges.select(col("dst").as("src"), col("src").as("dst")))
      .distinct())
    var labels = nodes.select(col("id"), col("id").as("label"))
    var i = 0
    while (i < iters) {
      val gathered = und
        .join(labels.select(col("id").as("dst"), col("label")), Seq("dst"))
        .groupBy(col("src"), col("label"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(col("src")).orderBy(col("cnt").desc, col("label"))
      val newLabels = gathered.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("src").as("id"), col("label"))
      labels = nodes.select(col("id"))
        .join(newLabels, Seq("id"), "left_outer")
        .select(col("id"), coalesce(col("label"), col("id")).as("label"))
      i += 1
    }
    labels
  }

  /** Per-node triangle count + local clustering coefficient over an
    * undirected edge list (`aCol` < `bCol`, already deduplicated — the
    * shape [[Dedup.minhashNearDups]] emits; NOTE
    * [[graft.operators.Similarity]]'s KNN graph does NOT — it is directed
    * per-node top-k, so canonicalize with least/greatest + distinct
    * before calling). For a near-dup graph this is the cluster-density
    * audit: a node whose neighborhood closes into triangles sits inside a
    * genuine dup clique; a high-degree node with NO triangles is a hub of
    * coincidental collisions (template boilerplate) and a candidate for
    * bucket-cap tuning.
    *
    * Algorithm: node-iterator over the id-oriented edge list — wedges
    * (a→b, b→c with a<b<c) close against a third oriented edge (a→c), so
    * each triangle is found exactly once (the classic compact-forward
    * counting scheme; id-orientation keeps wedge fanout C(outdeg,2)
    * bounded by upstream bucket caps rather than raw degree). Three
    * equi-joins and two aggregates, no driver state; at 100 TB orient by
    * (degree, id) instead of raw id to flatten skew further.
    *
    * clustering = 2·triangles / (degree·(degree−1)) — one double division
    * of exact longs, bit-identical cross-engine. */
  def triangleCensus(pairs: DataFrame, aCol: String = "a_id",
                     bCol: String = "b_id",
                     scope: CacheScope = CacheScope.unmanaged): DataFrame = {
    // cached: the oriented edge list feeds the degree count plus all
    // three wedge-join legs — when pairs is a MinHash pipeline output
    // (q164), the uncached plan re-runs it four times
    val e = scope.cached(
      pairs.select(col(aCol).as("a"), col(bCol).as("b")).distinct())
    val deg = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    val tri = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), Seq("y"))
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
    val perNode = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("n_triangles"))
    deg.join(perNode, Seq("node"), "left_outer")
      .select(col("node"), col("degree"),
        coalesce(col("n_triangles"), lit(0L)).as("n_triangles"))
      .withColumn("clustering",
        when(col("degree") >= 2,
          (lit(2.0) * col("n_triangles")) /
            (col("degree") * (col("degree") - 1)))
          .otherwise(lit(0.0)))
  }
}
