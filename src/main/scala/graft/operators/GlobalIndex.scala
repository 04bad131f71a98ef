package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Globally-ordered row numbering without the single-task sort.
  *
  * The naive formulation — `ROW_NUMBER() OVER (ORDER BY k)` with no
  * PARTITION BY — funnels the entire dataset through ONE task (Spark plans
  * a window over `SinglePartition`); at 100 TB that task never finishes.
  * This operator produces identical numbers from cluster-parallel pieces:
  *
  *  1. `repartitionByRange(k)` — range exchange, ascending key ranges per
  *     partition (the same shuffle a distributed ORDER BY performs),
  *  2. `sortWithinPartitions(k)` — parallel per-partition sorts,
  *  3. `zipWithIndex` — one lightweight count job over partition sizes,
  *     then each partition numbers itself from its prefix offset.
  *
  * Step 3 is the one place the RDD API is the right tool (the build rules'
  * "genuine per-partition imperative logic"): it attaches contiguous global
  * indexes with ZERO additional shuffle, where the DataFrame-only
  * formulation (window over `spark_partition_id` + broadcast offsets)
  * re-shuffles the full dataset once more just to cluster by partition id.
  *
  * `keyCols` must be a unique ordering (a PK, or key + tiebreakers):
  * range+sort order among duplicate keys is partition-dependent, and the
  * numbering is only reproducible when the total order is.
  */
object GlobalIndex {

  def withRowNumbers(df: DataFrame, keyCols: Seq[String],
                     numCol: String = "rn", partitions: Int = 0): DataFrame = {
    val spark = df.sparkSession
    val parts = if (partitions > 0) partitions else spark.sparkContext.defaultParallelism
    val sorted = df
      .repartitionByRange(parts, keyCols.map(col): _*)
      .sortWithinPartitions(keyCols.map(col): _*)
    val indexed = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ (i + 1L)) // 1-based like ROW_NUMBER
    }
    spark.createDataFrame(indexed,
      StructType(sorted.schema.fields :+ StructField(numCol, LongType, nullable = false)))
  }
}
