package graft.operators

import org.apache.spark.sql.DataFrame

/** Caller-managed lifetime for the intermediate `.cache()`s inside
  * multi-stage pipelines (MinHash signatures, LSH/SimHash bucket frames).
  *
  * The pipelines return lazy DataFrames, so they cannot unpersist their own
  * intermediates — only the caller knows when the terminal action has run.
  * Without a scope, every `dedup` CLI invocation or long-lived session call
  * accumulates session-lifetime cache entries sized "corpus signatures"
  * (round-5 verdict finding #2). Pass a scope and `release()` after the
  * terminal action; [[CacheScope.unmanaged]] (the default everywhere)
  * preserves the old behavior — cache and let the session own the entries —
  * without holding plan references.
  */
final class CacheScope private (track: Boolean) extends AutoCloseable {
  def this() = this(true)

  private val frames = scala.collection.mutable.ArrayBuffer[DataFrame]()
  private val rdds = scala.collection.mutable.ArrayBuffer[org.apache.spark.rdd.RDD[_]]()

  /** Cache `df` and register it for release. */
  private[graft] def cached(df: DataFrame): DataFrame = {
    df.cache()
    if (track) synchronized { frames += df }
    df
  }

  /** Eagerly `localCheckpoint` `df` and register the materialized blocks
    * for release — the checkpoint twin of [[cached]] for loop results that
    * must be DRAINED inside an operator (a checkpointed Dataset's own
    * `unpersist` goes through the SQL cache manager and never reaches the
    * checkpoint RDD's blocks; the RDD handle does). */
  private[graft] def checkpointed(df: DataFrame): DataFrame = {
    val cp = df.localCheckpoint(true)
    if (track) synchronized {
      cp.queryExecution.analyzed match {
        case lr: org.apache.spark.sql.execution.LogicalRDD => rdds += lr.rdd
        case _ => ()
      }
    }
    cp
  }

  /** Unpersist every frame cached through this scope (non-blocking). */
  def release(): Unit = synchronized {
    frames.foreach(f => scala.util.Try(f.unpersist(false)))
    frames.clear()
    rdds.foreach(r => scala.util.Try(r.unpersist(false)))
    rdds.clear()
  }

  override def close(): Unit = release()
}

object CacheScope {
  /** Caches but never tracks: session-lifetime entries, the pre-scope
    * behavior (e.g. one-shot `Verify`/`Bench` processes that clear or exit). */
  val unmanaged: CacheScope = new CacheScope(false)
}
