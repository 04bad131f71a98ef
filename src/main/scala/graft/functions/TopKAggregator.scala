package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (item, weight) candidate for top-k selection. */
final case class Weighted(item: String, weight: Long)

/** Typed top-k aggregate (`Aggregator[IN, BUF, OUT]`): keeps at most k
  * candidates per buffer, merged pairwise — the scalable alternative to
  * window `row_number() <= k`, which must sort entire partitions. Here every
  * partial buffer is bounded by k, map-side combine applies, and the shuffle
  * carries k rows per (group × partition) instead of the full group.
  *
  * Deterministic order: weight descending, then item ascending (total order,
  * so merges are associative and partitioning-independent).
  */
class TopKAggregator(k: Int) extends Aggregator[Weighted, Seq[Weighted], Seq[Weighted]] {

  // reduce appends and only sorts once the buffer reaches 2k, so the
  // per-row cost is amortized O(1) instead of a full sort-and-take per
  // input row; the buffer stays ≤ 2k-1 between prunes (still bounded for
  // the shuffle) and finish/merge always prune, so the visible result is
  // identical to prune-every-row
  private val pruneAt = 2 * k

  private def prune(xs: Seq[Weighted]): Seq[Weighted] =
    xs.sortBy(w => (-w.weight, w.item)).take(k)

  override def zero: Seq[Weighted] = Nil

  override def reduce(buf: Seq[Weighted], in: Weighted): Seq[Weighted] = {
    val appended = buf :+ in
    if (appended.length >= pruneAt) prune(appended) else appended
  }

  override def merge(a: Seq[Weighted], b: Seq[Weighted]): Seq[Weighted] =
    prune(a ++ b)

  override def finish(reduction: Seq[Weighted]): Seq[Weighted] = prune(reduction)

  override def bufferEncoder: Encoder[Seq[Weighted]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Weighted]] = ExpressionEncoder()
}

object TopKAggregator {
  /** Column-facing form: `topK(5)(col("word"), col("cnt"))`. */
  def topK(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new TopKAggregator(k), Encoders.product[Weighted])
}
