package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Column ⇄ Expression bridge for graft's native Catalyst expressions.
  *
  * Spark 4 hides the direct `Column(expr)` constructor behind
  * `private[sql]` (`org.apache.spark.sql.classic.ExpressionUtils`), so
  * expressions that close over runtime data (IVF centroid sets) either go
  * through the session-global `FunctionRegistry` — mutable shared state
  * that races when two queries with different constants resolve
  * concurrently — or through this bridge, which builds the `Column`
  * directly and keeps every query self-contained. The package placement
  * (`org.apache.spark.sql.graft`) is the standard open-source extension
  * pattern for reaching `private[sql]` API from a library.
  */
object ColumnBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)
}

/** LogicalPlan → DataFrame bridge (same `private[sql]` rationale as
  * [[ColumnBridge]]): lets specs execute a plan after applying an
  * optimizer rule by hand, independent of which extensions the shared
  * test session was built with. */
object PlanBridge {
  def ofRows(spark: org.apache.spark.sql.SparkSession,
             plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan)
      : org.apache.spark.sql.DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)

  /** The optimizer rules an extensions set would inject — `private[sql]`
    * on SparkSessionExtensions, surfaced for extension specs. */
  def optimizerRules(ext: org.apache.spark.sql.SparkSessionExtensions,
                     spark: org.apache.spark.sql.SparkSession)
      : Seq[org.apache.spark.sql.catalyst.rules.Rule[
        org.apache.spark.sql.catalyst.plans.logical.LogicalPlan]] =
    ext.buildOptimizerRules(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession])
}
