package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (backward) join — for each left row, attach the latest right row
  * whose time ≤ the left row's time, per key. Spark has no built-in as-of
  * join; per the preference order this *composes existing operators* rather
  * than adding a custom SparkPlan: tag both sides, union, and run one
  * `last(..., ignoreNulls)` window over (key, time).
  *
  * Scale shape: exactly one shuffle (hash by key, sort by time within
  * partition) regardless of how many right rows precede each left row — a
  * naive range join explodes quadratically on hot keys; this stays linear
  * and AQE-skew-splittable. The same pattern extends to forward/nearest
  * as-of by flipping the sort or running both directions.
  */
object AsOf {

  /** @param left      left rows (all columns kept)
    * @param right     right rows — only `key`, `timeCol`, `valueCols` used
    * @param key       equi-join key column name (both sides)
    * @param timeCol   ordering column name (both sides; any orderable type)
    * @param valueCols right columns carried onto left rows as `asof_<name>`
    *                  (null when no right row precedes the left row)
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String, timeCol: String,
               valueCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val unifiedCols = leftCols ++ valueCols.map(v => s"_asof_$v") :+ "_side"

    val taggedLeft = valueCols.foldLeft(left)((df, v) =>
      df.withColumn(s"_asof_$v", lit(null)))
      .withColumn("_side", lit(1))
      .select(unifiedCols.map(col): _*)

    // right side: extract _asof_* first, then null-fill the left-only shape
    // (ordering matters when a value column shares its name with a left column)
    val withAsof = valueCols.foldLeft(
      right.select((Seq(key, timeCol) ++ valueCols).distinct.map(col): _*))(
      (df, v) => df.withColumn(s"_asof_$v", col(v)))
    val taggedRight = leftCols.filterNot(Seq(key, timeCol).contains)
      .foldLeft(withAsof)((df, c) => df.withColumn(c, lit(null)))
      .withColumn("_side", lit(0))
      .select(unifiedCols.map(col): _*)

    // right rows sort before left rows at equal time → inclusive (≤) match
    val w = Window.partitionBy(col(key))
      .orderBy(col(timeCol), col("_side"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val filled = valueCols.foldLeft(taggedLeft.unionByName(taggedRight))((df, v) =>
      df.withColumn(s"_asof_$v", last(col(s"_asof_$v"), ignoreNulls = true).over(w)))

    filled.filter(col("_side") === 1)
      .select(leftCols.map(col) ++
        valueCols.map(v => col(s"_asof_$v").as(s"asof_$v")): _*)
  }
}
