package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Blocked fuzzy string matching (record linkage) — the reconciliation
  * operator for keys that *almost* agree across systems: match candidates
  * meet in cheap blocking buckets, and only co-bucketed pairs pay the
  * O(len²) edit-distance compare. A naive fuzzy join is a cartesian
  * product; blocking makes the shuffle O(Σ bucket²) with bucket sizes the
  * operator controls.
  *
  * Blocking scheme (pigeonhole): cut each string into `pieces` equal
  * pieces; one substitution touches exactly one piece, so the pair agrees
  * on all the others — candidates are joined on each of the `pieces`
  * (length, all-but-one-piece) keys and unioned. More pieces = longer
  * keys = smaller buckets at the cost of more (cheap, narrow) joins: with
  * id-style data, where most of the string is a shared constant and the
  * entropy sits in a couple of trailing digits, coarse schemes (halves,
  * quarters) leave one bucket holding the whole table — an eighth-piece
  * key still carries 7/8 of every string, so every block stays selective.
  * Provably complete for one substitution at any length and any
  * `pieces` >= 2.
  *
  * Scope: fixed-format keys (ids, codes, phone numbers) where variants
  * are substitutions; insert/delete variants change the length and need
  * deletion-neighborhood blocking — deliberately out of scope. Both
  * `levenshtein` and the blocking keys are engine-portable — the whole
  * operator replays in the DuckDB oracle.
  */
object FuzzyJoin {

  /** Pairs (a_id, b_id, dist) with edit distance ≤ `maxDist` (≤ 1 for the
    * completeness guarantee). `left`/`right`: (id, name) frames.
    *
    * Plan shape: the `pieces` block keys ride as one exploded array per
    * row (the LSH-banding layout, computed by the native
    * [[graft.functions.FuzzyBlockKeys]] expression in one byte scan per
    * key — the composed substr+hash form paid pieces×(pieces-1) string
    * allocations per row) so candidate generation is ONE shuffle join on
    * an 8-byte key, not `pieces` separate joins — at fixture scale stage
    * count dominates wall time, and at cluster scale one wide shuffle
    * beats eight narrow ones. */
  def fuzzyPairs(left: DataFrame, right: DataFrame, maxDist: Int = 1,
                 pieces: Int = 8): DataFrame = {
    import org.apache.spark.sql.graft.ColumnBridge
    def banded(df: DataFrame, id: String, name: String): DataFrame =
      df.select(col("id").as(id), col("name").as(name),
        explode(ColumnBridge.column(graft.functions.FuzzyBlockKeys(
          ColumnBridge.expression(col("name")), pieces))).as("bk"))
    val l = banded(left, "a_id", "a_name")
    // fan the (big) right side out before block-key explode + levenshtein
    // (no-op on a real multi-split source)
    val r = banded(Par.fanOutIfNarrow(right), "b_id", "b_name")
    l.join(r, Seq("bk"))
      .filter(col("a_id") =!= col("b_id"))
      // the block keys hash the length, so same-bucket pairs *almost*
      // always agree on it — this explicit equality closes the one
      // astronomically-unlikely gap: a 64-bit hash collision between
      // different-length strings at insert/delete distance 1 would pass
      // `dist <= 1` here while the oracle's length-equality blocking
      // excludes it. One cheap comparison buys exact cross-engine parity.
      .filter(length(col("a_name")) === length(col("b_name")))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
      .distinct()
  }
}
