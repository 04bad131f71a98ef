package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.operators.Dedup

/** Streaming candidate surfacing for the capped containment census
  * (`Dedup.containmentPairsCapped`, q186): the capped design is exactly
  * what makes containment STREAMABLE. The exact census's per-shingle
  * inverted list is unbounded — state the size of the corpus, which a
  * streaming state store must never hold (the reason [[IngestStream]]
  * uses foreachBatch) — but the capped census's bottom-`listCap` list is
  * a fixed-size value per key, so a `flatMapGroupsWithState` keyed by
  * shingle maintains the standing index incrementally and emits
  * candidate pairs as new documents arrive, with NO batch re-join
  * against the corpus.
  *
  * Retention is arrival-order independent: the state converges to the
  * bottom-`listCap` of every (salt-rank, id) ever seen — the same
  * deterministic set the batch census computes — because bottom-k under
  * a total order is associative. Emission is a candidate SUPERSET of
  * the batch census's pair stream (a doc admitted in one batch and
  * evicted by a later lower-ranked arrival emitted its pairs while
  * resident), the standard LSH-candidate contract: downstream verifies
  * ratios over the pairs it cares about. Pairs carry the shingle and a
  * `rare` flag (retained df ≤ maxDf at emission time) so the consumer
  * can replicate the census's rare-blocking gate with `max(rare)`.
  */
object ContainmentStream {

  /** One shingle occurrence: the salted-rank expansion of a document. */
  final case class Occ(sh: Long, rk: Long, id: Long)

  /** One emitted candidate co-occurrence event. */
  final case class PairEvent(a_id: Long, b_id: Long, sh: Long, rare: Boolean)

  /** Expand a (streaming or batch) document frame into salted shingle
    * occurrences — the same hashes and salt rank as the batch census, so
    * streaming state and batch results are directly comparable. */
  def occurrences(docs: DataFrame, idCol: String = "doc_id",
                  textCol: String = "text", k: Int = 3): Dataset[Occ] = {
    import docs.sparkSession.implicits._
    docs.select(col(idCol).cast("long").as("id"),
        explode(Dedup.shingles(textCol, k)).as("s"))
      .select(col("id"),
        expr("CAST(CONV(SUBSTRING(MD5(s), 1, 15), 16, 10) AS BIGINT)").as("sh"))
      .select(col("sh"),
        expr("((sh % 4294967291L) * 1000003L + (id % 4294967291L) * 999983L) " +
          "% 4294967291L").as("rk"),
        col("id"))
      .as[Occ]
  }

  /** Per-shingle state transition: merge the batch's occurrences into the
    * bounded bottom-k list, emit pairs between each newly-admitted doc and
    * every co-resident doc (both-new pairs emitted once, from the
    * lower-ranked side). Exposed for direct unit testing. */
  private[streaming] def transition(listCap: Int, maxDf: Int)(
      shKey: Long, batch: Iterator[Occ],
      state: GroupState[List[(Long, Long)]]): Iterator[PairEvent] = {
    val prev = state.getOption.getOrElse(Nil)
    val incoming = batch.map(o => (o.rk, o.id)).toList
    val merged = (prev ++ incoming).distinct.sorted.take(listCap)
    state.update(merged)
    val prevSet = prev.toSet
    val newcomers = merged.filterNot(prevSet)
    val newSet = newcomers.toSet
    val rare = merged.size <= maxDf
    val events = for {
      nc <- newcomers
      m <- merged
      if m._2 != nc._2
      // old residents pair with every newcomer; both-new pairs only from
      // the lower-ranked side so each is emitted exactly once
      if !newSet(m) || implicitly[Ordering[(Long, Long)]].lt(nc, m)
    } yield PairEvent(math.min(nc._2, m._2), math.max(nc._2, m._2), shKey, rare)
    events.distinct.iterator
  }

  /** The streaming candidate query: append-mode events, state bounded by
    * `listCap` entries per distinct shingle. */
  def candidatePairs(docs: DataFrame, idCol: String = "doc_id",
                     textCol: String = "text", k: Int = 3,
                     listCap: Int = 64, maxDf: Int = 20): Dataset[PairEvent] = {
    import docs.sparkSession.implicits._
    occurrences(docs, idCol, textCol, k)
      .groupByKey(_.sh)
      .flatMapGroupsWithState[List[(Long, Long)], PairEvent](
        OutputMode.Append(), GroupStateTimeout.NoTimeout())(
        transition(listCap, maxDf))
  }
}
