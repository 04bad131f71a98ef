package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation utilities for hot keys at cluster scale. AQE's skew-join
  * splitting handles sort-merge joins adaptively; these helpers cover the
  * cases AQE doesn't: skewed aggregations, and pre-planned salting when the
  * skew is known (e.g. a null-heavy FK or a power-law event key).
  *
  * All salts are content-derived (`xxhash64` of the row key + a stable
  * discriminator), never `rand()` — results stay deterministic under retry
  * and identical across partitionings.
  */
object Skew {

  /** Two-phase aggregation for skewed group keys: partial aggregate on
    * (key, salt) spreads a hot key over `saltFactor` reducers, then a final
    * merge on key. Works for any algebraic aggregate you can express as
    * (partial, merge) — here sum/count, the common fingerprint shapes. */
  def saltedSumCount(df: DataFrame, keyCol: String, valueCol: String,
                     saltFactor: Int = 16, saltBy: String): DataFrame =
    df.withColumn("_salt", pmod(xxhash64(col(saltBy)), lit(saltFactor)))
      .groupBy(col(keyCol), col("_salt"))
      .agg(sum(col(valueCol)).as("_psum"), count(lit(1)).as("_pcnt"))
      .groupBy(col(keyCol))
      .agg(sum(col("_psum")).as(s"sum_$valueCol"), sum(col("_pcnt")).as("cnt"))

  /** Salted inner equi-join for a skewed left side: left rows get a
    * content-derived salt in [0, saltFactor); the (smaller) right side is
    * replicated across every salt value, so each hot left key fans across
    * `saltFactor` reducers instead of one. */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 saltFactor: Int = 16, saltBy: String): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(col(saltBy)), lit(saltFactor)))
    val replicatedRight = right.withColumn("_salt",
      explode(array((0 until saltFactor).map(i => lit(i.toLong)): _*)))
    saltedLeft.join(replicatedRight, Seq(key, "_salt")).drop("_salt")
  }
}
