package graft.transfer

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Row-level change detection between two versions of a table — the
  * incremental-sync primitive the reference lacks (it re-transfers whole
  * tables; `validator.py` only diffs aggregates). One full-outer join on
  * the PK classifies every row as added / removed / changed / same;
  * downstream, an incremental transfer ships only the non-`same` rows.
  *
  * Scale: a single PK-hash shuffle of both sides (AQE-skew-tolerant), no
  * row hashing — column equality is evaluated with null-safe `<=>` directly
  * in the join projection, so no cross-engine string-rendering of values
  * is ever needed (a md5-of-concat formulation would be cheaper on wide
  * tables but ties the result to value formatting; correctness first).
  */
object Cdc {

  val StatusCol = "change_status"

  /** Tag every PK with its change status. `compareCols` defaults to all
    * non-PK columns present on BOTH sides. */
  def diff(oldDf: DataFrame, newDf: DataFrame, pkCols: Seq[String],
           compareCols: Seq[String] = Nil): DataFrame = {
    val cols =
      if (compareCols.nonEmpty) compareCols
      else oldDf.columns.filterNot(pkCols.contains)
        .filter(newDf.columns.contains(_)).toSeq
    val o = cols.foldLeft(oldDf)((df, c) => df.withColumnRenamed(c, s"o_$c"))
      .withColumn("o_present", lit(1))
    val n = cols.foldLeft(newDf)((df, c) => df.withColumnRenamed(c, s"n_$c"))
      .withColumn("n_present", lit(1))
    val anyNeq: Column = cols.map(c => !(col(s"o_$c") <=> col(s"n_$c")))
      .reduceOption(_ || _).getOrElse(lit(false))
    o.join(n, pkCols, "full_outer")
      .withColumn(StatusCol,
        when(col("o_present").isNull, "added")
          .when(col("n_present").isNull, "removed")
          .when(anyNeq, "changed")
          .otherwise("same"))
      .select(pkCols.map(col) :+ col(StatusCol): _*)
  }

  /** Per-status row counts — the summary an incremental sync logs. */
  def diffSummary(oldDf: DataFrame, newDf: DataFrame, pkCols: Seq[String]): DataFrame =
    diff(oldDf, newDf, pkCols)
      .groupBy(col(StatusCol)).agg(count(lit(1)).as("cnt"))
      .orderBy(col(StatusCol))

  /** The rows an incremental transfer must ship: new-side rows whose PK is
    * added or changed (removed rows are a delete list, emitted separately). */
  def upserts(oldDf: DataFrame, newDf: DataFrame, pkCols: Seq[String]): DataFrame =
    newDf.join(
      diff(oldDf, newDf, pkCols)
        .filter(col(StatusCol).isin("added", "changed"))
        .select(pkCols.map(col): _*),
      pkCols)
}
