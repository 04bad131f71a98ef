package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Winnowing document fingerprints (Schleimer/Wilkerson/Aiken 2003 — the
  * MOSS local-similarity scheme): hash every k-token window, slide a
  * window of `w` consecutive hashes, keep each window's minimum. The
  * guarantee: any shared run of k+w-1 tokens between two documents selects
  * at least one common fingerprint, so locally-plagiarized passages
  * surface even when the documents are globally dissimilar — a different
  * detection regime from MinHash (global Jaccard) and containment (whole
  * shingle sets).
  *
  * Scale shape: the k-gram explode is the q107-class shuffle (one row per
  * corpus token), but the window min runs inside a per-document partition
  * (documents are bounded-length, so no skew wall), and everything after
  * the DISTINCT is fingerprint-keyed — the selected set is ~2/(w+1) of the
  * gram count, and the pair join is df-capped exactly like
  * [[Dedup.containmentPairs]]'s rare-shingle blocking.
  *
  * Hashes stay 8-hex-char STRINGS (md5 prefix): lexicographic MIN over hex
  * is identical in Spark and DuckDB, so the fingerprint set replays
  * bit-for-bit with no integer-overflow gymnastics.
  */
object Winnow {

  /** (id, fp) — the deduplicated winnowing fingerprint set per document.
    * Only full w-hash windows select (trailing partials are excluded in
    * both engines); documents shorter than k+w-1 tokens contribute none. */
  def fingerprints(docs: DataFrame, idCol: String, textCol: String,
                   k: Int = 4, w: Int = 4): DataFrame = {
    graft.functions.GraftFunctions.register(docs.sparkSession)
    val grams = docs.select(col(idCol).as("id"),
      posexplode(graft.functions.GraftFunctions.wordNgrams(col(textCol), k))
        .as(Seq("pos", "g")))
      .withColumn("h", substring(md5(col("g")), 1, 8))
    val perDoc = Window.partitionBy(col("id"))
    val sel = Window.partitionBy(col("id")).orderBy(col("pos"))
      .rowsBetween(Window.currentRow, w - 1)
    grams
      .withColumn("n_grams", count(lit(1)).over(perDoc))
      .withColumn("winmin", min(col("h")).over(sel))
      .filter(col("pos") <= col("n_grams") - w)
      .select(col("id"), col("winmin").as("fp"))
      .distinct()
  }

  /** Document pairs sharing ≥ `minShared` fingerprints, fingerprint df
    * capped at `maxDf` (boilerplate fingerprints shared corpus-wide never
    * drive a quadratic join). Output: (a_id, b_id, n_shared), a_id<b_id. */
  def sharedFingerprintPairs(docs: DataFrame, idCol: String, textCol: String,
                             k: Int = 4, w: Int = 4, maxDf: Int = 20,
                             minShared: Int = 3): DataFrame = {
    val fp = fingerprints(docs, idCol, textCol, k, w)
    val ok = fp.groupBy(col("fp")).agg(count(lit(1)).as("df"))
      .filter(col("df") >= 2 && col("df") <= maxDf)
      .select(col("fp"))
    val b = fp.join(ok, Seq("fp"))
    b.select(col("fp"), col("id").as("a_id"))
      .join(b.select(col("fp"), col("id").as("b_id")), Seq("fp"))
      .filter(col("a_id") < col("b_id"))
      .groupBy(col("a_id"), col("b_id"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }
}
