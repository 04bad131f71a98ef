package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

import graft.sources.Tables

/** Shared helpers for the oracle-checked query suite.
  *
  * Cross-engine hash-match discipline (driver compares Spark vs DuckDB on
  * identical parquet): floating-point SUMs are order-dependent, so every
  * summed double is first cast to an exact `DecimalType` (deterministic
  * round-to-nearest of the underlying double in both engines), summed
  * exactly, then cast back to double — bit-identical results regardless of
  * partitioning/accumulation order (SURVEY §7 "hard parts" #1).
  *
  * Transcendental caveat (accepted residual risk): queries using ln/log2/
  * exp (q104/q111/q118/q119/q121/q130/q131) feed both engines the SAME
  * double argument (integer-ratio or decimal-rounded), but JVM `Math.log`
  * and DuckDB's libm may differ in the last ulp. Each such value is
  * rounded to DECIMAL(30,6..9) immediately after the transcendental, so a
  * hash flip requires a 1-ulp divergence to land EXACTLY on a 1e-6..1e-9
  * rounding boundary — ~1 in 10^7 per value given ~1e-16 ulp spacing, and
  * every round so far has hash-matched. If one ever flips, coarsen that
  * query's rounding scale by one digit on BOTH sides; do not switch to
  * tolerance-compare (the driver hashes exact bytes).
  */
object Q {
  type QueryFn = (SparkSession, String) => DataFrame

  def t(s: SparkSession, dir: String, name: String): DataFrame = Tables.load(s, dir, name)

  /** Epoch milliseconds of a timestamp column regardless of its parquet
    * encoding. The fixture's `events.ts` has arrived as TIMESTAMP(NANOS),
    * TIMESTAMP(MICROS, adjusted-to-UTC) and TIMESTAMP_NTZ across driver
    * regenerations; `unix_millis` only accepts TIMESTAMP, so cast first —
    * a no-op for TIMESTAMP, and for NTZ under the suite's fixed UTC session
    * timezone an identity reinterpretation of the same micros, matching
    * DuckDB's `epoch_ms(CAST(ts AS TIMESTAMP))` on the naive value. */
  def millisUtc(c: Column): Column =
    unix_millis(c.cast(org.apache.spark.sql.types.TimestampType))

  /** Order-independent exact sum of a double column, returned as double. */
  def dsum(c: Column, p: Int = 30, s: Int = 6): Column =
    sum(c.cast(DecimalType(p, s))).cast("double")

  /** Matching DuckDB SQL fragment for [[dsum]]. */
  def dsumSql(expr: String, p: Int = 30, s: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL($p,$s))) AS DOUBLE)"

  /** Exact average: exact decimal sum cast to double, divided by count —
    * one double division, same op in both engines. */
  def davg(c: Column, p: Int = 30, s: Int = 6): Column =
    sum(c.cast(DecimalType(p, s))).cast("double") / count(c)

  def davgSql(expr: String, p: Int = 30, s: Int = 6): String =
    s"CAST(SUM(CAST($expr AS DECIMAL($p,$s))) AS DOUBLE) / COUNT($expr)"
}
