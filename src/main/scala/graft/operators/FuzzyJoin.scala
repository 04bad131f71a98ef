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
  * Completeness: for same-length strings, edit distance 1 means exactly
  * one substitution, so the (prefix, suffix) block pair below is provably
  * complete for distance ≤ 1 — a substitution in the last `sufLen` chars
  * leaves the prefix block intact, any other position leaves the suffix
  * block intact. Larger distance budgets use more/looser blocks (the
  * standard multi-blocking trade: recall vs candidate volume).
  *
  * Both `levenshtein` and the blocking keys are engine-portable — the
  * whole operator replays in the DuckDB oracle.
  */
object FuzzyJoin {

  /** Pairs (a_id, b_id, dist) with edit distance ≤ `maxDist`, candidates
    * via prefix-block ∪ suffix-block. `left`/`right`: (id, name) frames. */
  def fuzzyPairs(left: DataFrame, right: DataFrame, maxDist: Int = 1,
                 prefixLen: Int = 16, sufLen: Int = 2): DataFrame = {
    val l = left.select(col("id").as("a_id"), col("name").as("a_name"))
    val r = right.select(col("id").as("b_id"), col("name").as("b_name"))
    def block(key: String => Column): DataFrame =
      l.withColumn("bk", key("a_name"))
        .join(r.withColumn("bk", key("b_name")), Seq("bk"))
        .drop("bk")
    val byPrefix = block(c => substring(col(c), 1, prefixLen))
    val bySuffix = block(c => substring(col(c), -sufLen, sufLen))
    byPrefix.union(bySuffix)
      .filter(col("a_id") =!= col("b_id"))
      .withColumn("dist", levenshtein(col("a_name"), col("b_name")))
      .filter(col("dist") <= maxDist)
      .select(col("a_id"), col("b_id"), col("dist"))
      .distinct()
  }
}
