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
  * Completeness: equal-length strings at edit distance 1 differ by exactly
  * one substitution, which falls in exactly one HALF of the string — so
  * blocking on (length, first half) ∪ (length, second half) is provably
  * complete for one substitution at ANY length (no fixed prefix/suffix
  * width to fall outside of). Scope: fixed-format keys (ids, codes,
  * phone numbers) where variants are substitutions; insert/delete
  * variants change the length and need deletion-neighborhood blocking —
  * deliberately out of scope here. Larger budgets use more/looser blocks
  * (the standard multi-blocking trade: recall vs candidate volume).
  *
  * Both `levenshtein` and the blocking keys are engine-portable — the
  * whole operator replays in the DuckDB oracle.
  */
object FuzzyJoin {

  /** Pairs (a_id, b_id, dist) with edit distance ≤ `maxDist`, candidates
    * via the two half-blocks. `left`/`right`: (id, name) frames. */
  def fuzzyPairs(left: DataFrame, right: DataFrame, maxDist: Int = 1): DataFrame = {
    val l = left.select(col("id").as("a_id"), col("name").as("a_name"))
    val r = right.select(col("id").as("b_id"), col("name").as("b_name"))
    // (length, half) composite keys; length in the key keeps unequal-length
    // strings (distance >= 1 by insertion alone) from colliding needlessly
    def firstHalf(c: String): Column =
      concat(length(col(c)).cast("string"), lit(":"),
        expr(s"substr($c, 1, CAST(length($c) / 2 AS INT))"))
    def secondHalf(c: String): Column =
      concat(length(col(c)).cast("string"), lit(":"),
        expr(s"substr($c, CAST(length($c) / 2 AS INT) + 1)"))
    def block(key: String => Column): DataFrame =
      l.withColumn("bk", key("a_name"))
        .join(r.withColumn("bk", key("b_name")), Seq("bk"))
        .drop("bk")
    block(firstHalf).union(block(secondHalf))
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
      .distinct()
  }
}
