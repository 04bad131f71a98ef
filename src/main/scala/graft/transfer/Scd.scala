package graft.transfer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension (type 2) history build: a change stream of
  * (key, change_ts, attributes…) becomes validity intervals —
  * `effective_from` = the change time, `effective_to` = the NEXT change's
  * time (open for the current row), `is_current` on the last. The standard
  * warehouse-dimension shape a migration tool is asked to produce right
  * after it moves the raw change feed.
  *
  * One window over (key ORDER BY ts, tiebreaker) — a single shuffle on the
  * dimension key, linear in history depth, no self-join (the naive
  * formulation joins each change to its successor). Consecutive rows with
  * UNCHANGED attributes are collapsed first (lag compare) so reloaded
  * snapshots don't fragment the history.
  */
object Scd {

  /** @param df        change stream
    * @param keyCol    dimension key
    * @param tsCol     change timestamp (ms-comparable)
    * @param attrCols  tracked attributes — a row opens a new interval only
    *                  when one of them actually changed
    * @param tieCol    deterministic tiebreaker for same-instant changes */
  def scd2(df: DataFrame, keyCol: String, tsCol: String,
           attrCols: Seq[String], tieCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val changed = attrCols
      .map(a => !(lag(col(a), 1).over(w) <=> col(a)))
      .reduce(_ || _)
    val deduped = df
      .withColumn("_changed",
        lag(col(tsCol), 1).over(w).isNull || changed)
      .filter(col("_changed"))
      .drop("_changed")
    val w2 = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    deduped
      .withColumn("effective_from", col(tsCol))
      .withColumn("effective_to", lead(col(tsCol), 1).over(w2))
      .withColumn("is_current", col("effective_to").isNull)
  }
}
