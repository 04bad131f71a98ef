package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator

/** One (rank-key, id) candidate for bottom-k selection. */
final case class RankedId(rk: Long, id: Long)

/** Typed bottom-k aggregate: keeps at most `k` ids per group, the ones with
  * the SMALLEST (rk, id) keys — the bounded-state building block for capped
  * inverted lists (see `Dedup.containmentPairsCapped`). Like
  * [[TopKAggregator]], every partial buffer is bounded (≤ 2k-1 between
  * prunes), map-side combine applies, and the shuffle carries at most k
  * rows per (group × partition) instead of the full group — the property
  * that makes a df-10⁶ boilerplate shingle cost the same as a df-k one.
  *
  * Deterministic: (rk, id) is a total order, so merges are associative and
  * partitioning-independent; exact duplicates (same rk AND id, which a
  * 60-bit hash collision inside one document produces) are interchangeable
  * under the order, so the retained MULTISET is stable even then. `finish`
  * re-sorts the survivors by id ascending — the orientation downstream
  * pair expansion (`a_id < b_id`) requires.
  */
class BottomKIdsAggregator(k: Int)
    extends Aggregator[RankedId, Seq[RankedId], Seq[Long]] {

  private val pruneAt = 2 * k

  private def prune(xs: Seq[RankedId]): Seq[RankedId] =
    xs.sortBy(r => (r.rk, r.id)).take(k)

  override def zero: Seq[RankedId] = Nil

  override def reduce(buf: Seq[RankedId], in: RankedId): Seq[RankedId] = {
    val appended = buf :+ in
    if (appended.length >= pruneAt) prune(appended) else appended
  }

  override def merge(a: Seq[RankedId], b: Seq[RankedId]): Seq[RankedId] =
    prune(a ++ b)

  override def finish(reduction: Seq[RankedId]): Seq[Long] =
    prune(reduction).map(_.id).sorted

  override def bufferEncoder: Encoder[Seq[RankedId]] = ExpressionEncoder()

  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder()
}

object BottomKIds {
  /** Column-facing form: `bottomKIds(64)(col("rk"), col("id"))` →
    * `array<bigint>` of the ≤k ids with the smallest keys, id-ascending. */
  def bottomKIds(k: Int): org.apache.spark.sql.expressions.UserDefinedFunction =
    org.apache.spark.sql.functions.udaf(new BottomKIdsAggregator(k),
      Encoders.product[RankedId])
}
