package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Line-level exact deduplication (the RefinedWeb/CCNet pass): the corpus
  * is re-cut into fixed-`lineTokens` token lines, the globally FIRST
  * occurrence of each distinct line (by (doc, position)) survives, later
  * copies are dropped, and each document is reassembled from its surviving
  * lines in order.
  *
  * Scale shape: the first-occurrence decision is `min(struct(id, line_no))`
  * GROUPED by line text — an aggregate, not a `row_number` window. The
  * difference matters precisely on the skew case this pass exists for:
  * a boilerplate line repeated 10^8 times is collapsed to ONE row per map
  * partition by the partial min before anything shuffles, where a window
  * would shuffle and sort all 10^8 copies into a single partition. No
  * bucket caps needed — the combine IS the skew mitigation. Reassembly
  * groups the surviving lines (bounded by DISTINCT lines) by doc and joins
  * them back to the id-keyed document spine. No self-join, no cartesian.
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
    // native codegen'd line cutting (WordLines) — posexplode's index IS the
    // line number; the interpreted transform/struct HOF chain this replaced
    // evaluated ~10× slower per corpus scan
    val exploded = Par.fanOutIfNarrow(df.select(col(idCol), col(textCol)))
      .select(col(idCol), posexplode(
        graft.functions.GraftFunctions.wordLines(col(textCol), lineTokens))
        .as(Seq("ln0", "line")))
      .select(col(idCol), col("ln0").cast("long").as("line_no"), col("line"))
    // struct min orders field-by-field = lexicographic (id, line_no): the
    // same global first-occurrence the reference pass defines
    val winners = exploded
      .groupBy(col("line"))
      .agg(min(struct(col(idCol).as("id"), col("line_no").as("pos"))).as("first"))
      .select(col("first.id").as(idCol), col("first.pos").as("line_no"), col("line"))
    val kept = winners.groupBy(col(idCol))
      .agg(
        count(lit(1)).as("n_kept"),
        concat_ws(" ",
          transform(
            array_sort(collect_list(struct(col("line_no"), col("line")))),
            s => s.getField("line"))).as("clean_text"))
    df.select(col(idCol), nLines.cast("long").as("n_lines"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol), col("n_lines"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        coalesce(col("clean_text"), lit("")).as("clean_text"))
  }
}
