package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Query suites live under [[graft.queries]]; this object only aggregates
  * them into the driver's expected shape.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The pricing-summary slice (scan→filter→agg→sort, SURVEY §7 step 2). */
  def entry(spark: SparkSession): DataFrame =
    CoreQueries.defs("q01_pricing_summary")(spark, "/root/testdata/sf0.001")

  private val suites: Seq[(Map[String, Q.QueryFn], Map[String, String])] = Seq(
    (CoreQueries.defs, CoreQueries.oracles),
    (EventQueries.defs, EventQueries.oracles),
    (DedupQueries.defs, DedupQueries.oracles),
    (TextQueries.defs, TextQueries.oracles),
    (ParityQueries.defs, ParityQueries.oracles))

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    suites.iterator.flatMap(_._1).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    suites.iterator.flatMap(_._2).toMap
}
