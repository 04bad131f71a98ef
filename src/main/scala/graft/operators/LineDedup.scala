package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Line-level exact deduplication (the RefinedWeb/CCNet pass): the corpus
  * is re-cut into fixed-`lineTokens` token lines, the globally FIRST
  * occurrence of each distinct line (by (doc, position)) survives, later
  * copies are dropped, and each document is reassembled from its surviving
  * lines in order.
  *
  * Scale shape: the dedup decision is one shuffle keyed on the line text —
  * bounded by the number of DISTINCT lines, with map-side nothing to
  * combine but also no skew beyond genuinely viral lines (boilerplate —
  * exactly what the pass exists to strip; a production run would cap those
  * buckets the way [[Dedup]] caps LSH buckets). Reassembly is a second
  * shuffle on doc id. No self-join, no cartesian anywhere.
  *
  * Line cutting is arithmetic on the token array (`transform(sequence)` +
  * `slice`), not an explode-then-window re-segmentation — the array never
  * leaves the row until the single explode that feeds the dedup shuffle.
  */
object LineDedup {

  /** Returns (idCol, n_lines, n_kept, clean_text) per document. Documents
    * whose every line was dropped still appear (n_kept = 0, empty text). */
  def dedupLines(df: DataFrame, idCol: String, textCol: String,
                 lineTokens: Int = 10): DataFrame = {
    val toks = split(col(textCol), " ")
    // ceil(size/lineTokens) in int space; split("") yields [""] so size >= 1
    val nLines = ((size(toks) + lit(lineTokens - 1)) / lit(lineTokens)).cast("int")
    val lines = transform(
      sequence(lit(0), nLines - 1),
      i => struct(
        i.cast("long").as("line_no"),
        concat_ws(" ", slice(toks, i * lineTokens + 1, lit(lineTokens))).as("line")))
    val exploded = df
      .select(col(idCol), explode(lines).as("l"))
      .select(col(idCol), col("l.line_no"), col("l.line"))
    val firstOccurrence = Window.partitionBy(col("line"))
      .orderBy(col(idCol), col("line_no"))
    val flagged = exploded.withColumn("keep",
      when(row_number().over(firstOccurrence) === 1, 1L).otherwise(0L))
    flagged.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_lines"),
        sum(col("keep")).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(when(col("keep") === 1,
              struct(col("line_no"), col("line"))))),
            s => s.getField("line"))).as("clean_text"))
  }
}
