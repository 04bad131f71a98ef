package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Leakage-safe train/val/test assignment for training corpora.
  *
  * The standard failure mode of a naive per-document hash split is that
  * duplicate (or near-duplicate) documents land on both sides of the
  * train/eval boundary — the eval set then "leaks" training content and
  * overstates model quality. The fix the dedup literature prescribes is to
  * split by DUPLICATE CLUSTER, not by document: every member of a cluster
  * inherits the split of the cluster's representative, so a passage can
  * never straddle the boundary.
  *
  * Reference scope: the migration tool has no training-split notion; this
  * is part of the LLM-pipeline extension surface (brief: operations a
  * large-scale training-data pipeline needs).
  *
  * Determinism discipline: the split is a pure function of md5 hex —
  * `substr(md5(key), 1, 2)` compared against fixed hex thresholds
  * (`"e6"` = 230/256 ≈ 89.8% train, `"f3"` = 243/256 ≈ 94.9% cumulative
  * val, rest test). String comparison of lowercase hex is identical in
  * Spark and DuckDB, so assignments replay bit-for-bit cross-engine, and
  * re-running the pipeline on a grown corpus never reassigns an existing
  * key (the property that keeps eval sets frozen across corpus releases).
  */
object Splits {

  /** Deterministic split label for an integer/string key: md5-bucketed
    * ~90/5/5. Pure column expression — usable per-row at any scale. */
  def splitLabel(key: Column): Column = {
    val h = substring(md5(key.cast("string").cast("binary")), 1, 2)
    when(h < "e6", "train").when(h < "f3", "val").otherwise("test")
  }

  /** Matching DuckDB fragment for [[splitLabel]]. */
  def splitLabelSql(key: String): String =
    s"""CASE WHEN substr(md5(CAST($key AS VARCHAR)), 1, 2) < 'e6' THEN 'train'
       |     WHEN substr(md5(CAST($key AS VARCHAR)), 1, 2) < 'f3' THEN 'val'
       |     ELSE 'test' END""".stripMargin

  /** Cluster-aware split census: exact-dup clusters (content-hash groups)
    * are assigned a split by their representative (min doc id), and the
    * report counts, per split, the clusters, the documents they carry, and
    * how many of those clusters a NAIVE per-document split would have torn
    * across a boundary (`n_leaked_naive` — the leakage this operator
    * exists to prevent; 0 by construction for the cluster-aware split).
    *
    * Scale shape: one content-hash shuffle (uniform by construction — the
    * key is md5 of the text) with partial aggregation, then a 3-group
    * final aggregate. The per-cluster distinct naive-split count has only
    * 3 possible values, so the distinct rewrite's (ch, naive_split)
    * map-side combine caps per-cluster state at 3 rows however large the
    * cluster. No joins, no driver-side state.
    */
  def clusterSplitCensus(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val d = docs.select(
      col(idCol).as("id"),
      md5(col(textCol).cast("binary")).as("ch"),
      splitLabel(col(idCol)).as("naive_split"))
    d.groupBy(col("ch"))
      .agg(min(col("id")).as("rep"),
        count(lit(1)).as("csize"),
        countDistinct(col("naive_split")).as("n_naive"))
      .select(splitLabel(col("rep")).as("split"), col("csize"), col("n_naive"))
      .groupBy(col("split"))
      .agg(count(lit(1)).as("n_clusters"),
        sum(col("csize")).as("n_docs"),
        sum(when(col("n_naive") > 1, 1L).otherwise(0L)).as("n_leaked_naive"))
      .orderBy(col("split"))
  }
}
