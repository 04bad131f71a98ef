package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact-substring deduplication — the suffix-array pass of Lee et al. 2022
  * ("Deduplicating Training Data Makes Language Models Better", PAPERS.md),
  * re-expressed as a distributed k-token sliding-window pipeline: any
  * ≥k-token span whose exact token sequence occurred EARLIER in the corpus
  * (global (doc, position) order, first occurrence wins) is a kill span;
  * overlapping kill spans merge per document. Where q107's census COUNTS
  * repeated 8-grams, this operator decides what to REMOVE.
  *
  * Distributed shape, stage by stage:
  *   1. window enumeration is `transform(sequence(...))` arithmetic on the
  *      token array inside the row — the array is never duplicated across
  *      window rows; one `explode` feeds the shuffle (same discipline as
  *      [[LineDedup]]).
  *   2. the first-occurrence decision is `min(struct(doc, pos))` GROUPED BY
  *      window text — a partial-aggregatable min, so a boilerplate span
  *      repeated 10^8 times collapses to one candidate per map partition
  *      before anything shuffles (a `row_number` window would sort all
  *      copies into one partition; the combine IS the skew mitigation).
  *   3. later occurrences are identified by joining windows back to winners
  *      on the window text (AQE handles residual gram skew), yielding one
  *      [start, start+k) kill interval per duplicated window.
  *   4. span merge is the classic sorted-interval union: per doc, order
  *      intervals by start and subtract each interval's overlap with the
  *      running max end of its predecessors. The window partitions by
  *      DOCUMENT (bounded: a doc has < its token count intervals), never
  *      globally — no single-partition stage anywhere.
  *
  * At 100 TB the dominant cost is stage 2's shuffle of distinct k-token
  * windows, the same cardinality class as the q107 census that measured a
  * 0.87 wall exponent at x100 — and here the map-side min combine sends
  * one winner candidate per (gram, partition) rather than every
  * occurrence.
  */
object SubstringDedup {

  /** The kill intervals themselves: one `(idCol, start, end)` row per
    * duplicated window, [start, end) over 1-based token positions —
    * shared by the accounting ([[killSpans]]) and the rewrite
    * ([[rewrite]]) paths. */
  private def spanFrames(df: DataFrame, idCol: String, textCol: String,
                         k: Int): (DataFrame, DataFrame) = {
    require(k >= 2, s"window of $k tokens is not a substring test")
    // fan a narrow scan out before the per-row window enumeration (no-op
    // on a real multi-split corpus): the n-gram explode feeds the widest
    // shuffle of the pipeline and would otherwise run on one task
    val d = Par.fanOutIfNarrow(df.select(col(idCol), col(textCol)))
    val toks = d.select(col(idCol), split(col(textCol), " ").as("ts"))
    // native codegen'd window enumeration (WordNgrams) — the interpreted
    // transform/struct HOF chain this replaced cost ~10× per scan;
    // posexplode's 0-based index becomes the 1-based window position.
    // Short docs are guarded out (WordNgrams would emit their one
    // truncated window).
    val wins = d.filter(size(split(col(textCol), " ")) >= k)
      .select(col(idCol), posexplode(
        graft.functions.GraftFunctions.wordNgrams(col(textCol), k))
        .as(Seq("pos0", "gram")))
      .select(col(idCol), (col("pos0") + 1).as("pos"), col("gram"))
    val firsts = wins
      .groupBy(col("gram"))
      .agg(min(struct(col(idCol).as("id"), col("pos").as("p"))).as("first"))
    val spans = wins.join(firsts, Seq("gram"))
      .filter(!(col(idCol) === col("first.id") && col("pos") === col("first.p")))
      .select(col(idCol), col("pos").as("start"), (col("pos") + k).as("end"))
    (toks, spans)
  }

  /** Per-document kill-span accounting for `k`-token exact-substring dedup:
    * (idCol, total_tokens, removed_tokens, kept_tokens), documents with no
    * kill span omitted. Token positions are 1-based; a kill interval is
    * [pos, pos+k). `removed_tokens` is the merged-union length of all kill
    * intervals, i.e. exactly how many tokens a rewrite pass would drop. */
  def killSpans(df: DataFrame, idCol: String, textCol: String,
                k: Int = 8): DataFrame = {
    val (toks, spans) = spanFrames(df, idCol, textCol, k)
    val prev = Window.partitionBy(col(idCol)).orderBy(col("start"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val removed = spans
      .withColumn("covered", greatest(coalesce(max(col("end")).over(prev), col("start")),
        col("start")))
      .withColumn("contrib", greatest(col("end") - col("covered"), lit(0)))
      .groupBy(col(idCol))
      .agg(sum(col("contrib")).cast("long").as("removed_tokens"))
    toks.select(col(idCol), size(col("ts")).cast("long").as("total_tokens"))
      .join(removed, Seq(idCol))
      .select(col(idCol), col("total_tokens"), col("removed_tokens"),
        (col("total_tokens") - col("removed_tokens")).as("kept_tokens"))
  }

  /** The rewrite pass: every document survives with its killed spans
    * REMOVED — `(idCol, clean_text)`, the actual Lee-et-al. dedup output a
    * training pipeline feeds the tokenizer. Every doc appears (untouched
    * docs keep their text verbatim).
    *
    * Shape: the bounded per-doc span list rides a `collect_list` group
    * (same reassembly discipline as [[LineDedup]] — a doc has fewer spans
    * than tokens), then token filtering is per-row array arithmetic
    * (`transform` + `filter` + `exists`), no second shuffle. The per-token
    * span probe is O(tokens · spans) within one document — bounded by
    * document length squared in the worst case, and the spans of real
    * boilerplate overlap so heavily that the merged count stays tiny. */
  def rewrite(df: DataFrame, idCol: String, textCol: String,
              k: Int = 8): DataFrame = {
    val (_, spans) = spanFrames(df, idCol, textCol, k)
    val perDoc = spans.groupBy(col(idCol))
      .agg(collect_list(struct(col("start"), col("end"))).as("__spans"))
    df.join(perDoc, Seq(idCol), "left")
      .withColumn("__clean",
        when(col("__spans").isNull, col(textCol)).otherwise(expr(
          s"""concat_ws(' ', transform(
             |  filter(
             |    transform(split($textCol, ' '),
             |      (t, i) -> named_struct('t', t, 'p', i + 1)),
             |    s -> NOT exists(__spans,
             |      sp -> s.p >= sp.start AND s.p < sp.end)),
             |  s -> s.t))""".stripMargin)))
      .drop("__spans").drop(textCol)
      .withColumnRenamed("__clean", textCol)
  }
}
