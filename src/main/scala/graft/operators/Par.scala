package graft.operators

import org.apache.spark.sql.DataFrame

/** Parallelism-shape helpers shared by the operator library and the
  * declared-query suite. */
object Par {

  /** Spread a narrow scan across the session's cores before CPU-heavy
    * per-row work (optimization guide §2.5 input skew / §1.2 idle
    * capacity). Spark's split math can hand a whole table to one task —
    * single-file sources, or a single parquet row group (splits are byte
    * ranges, but a row group goes entirely to the split holding its
    * midpoint) — and then every downstream expression of the stage runs
    * serially while the rest of the machine idles.
    *
    * The exchange engages ONLY when the source plans fewer partitions than
    * `defaultParallelism`: a real multi-file corpus (the 100 TB case)
    * plans thousands of splits, so this is a no-op there and the
    * round-robin exchange is never a tax at scale. Callers should project
    * (and push filters) BEFORE fanning out so the exchange carries only
    * the columns the query needs (guide §2.3). Results are unaffected by
    * construction for the operators this guards: exact-decimal/integer
    * aggregates and window/sort shapes whose keys are total orders. */
  def fanOutIfNarrow(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }
}
