package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized range join — point-in-interval matching without the
  * BroadcastNestedLoop/cartesian plan Spark falls back to for pure theta
  * joins. Intervals explode to the fixed-width buckets they overlap, points
  * bucket once, and the match becomes an equi-join on the bucket id plus an
  * exact residual filter.
  *
  * Scale shape: shuffle keyed by bucket; right-side fanout is
  * ceil(interval/width)+1 rows per interval — bounded and chosen via
  * `bucketWidth`, versus unbounded pair enumeration in a nested loop. Works
  * for overlapping intervals (a point may match many), which equality
  * bucketing alone cannot express.
  */
object RangeJoin {

  /** Join `left` rows whose `pointCol` falls in [`loCol`, `hiCol`) of
    * `right`. Columns from both sides are kept (right's lo/hi included). */
  def pointInInterval(left: DataFrame, pointCol: String,
                      right: DataFrame, loCol: String, hiCol: String,
                      bucketWidth: Double): DataFrame = {
    require(bucketWidth > 0, "bucketWidth must be positive")
    val lb = left.withColumn("_bucket", floor(col(pointCol) / bucketWidth).cast("long"))
    val rb = right.withColumn("_bucket",
      explode(sequence(
        floor(col(loCol) / bucketWidth).cast("long"),
        floor(col(hiCol) / bucketWidth).cast("long"))))
    lb.join(rb, Seq("_bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bucket")
  }
}
