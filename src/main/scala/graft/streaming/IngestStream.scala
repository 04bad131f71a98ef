package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.operators.{CacheScope, Dedup}

/** Rolling-ingestion dedup: the streaming face of
  * [[graft.operators.Dedup.incrementalNearDups]] (q105). Each micro-batch
  * of incoming documents is deduplicated against the standing corpus — a
  * parquet directory that GROWS as batches are accepted, so later batches
  * automatically dedup against earlier batches' survivors as well as the
  * seed corpus — and the survivors are appended.
  *
  * `foreachBatch`, not a stateful streaming operator, because the dedup is
  * a batch join against mutable external state (the corpus directory):
  * signature state the size of the whole corpus is exactly what a state
  * store must not hold, while the batch pipeline re-reads only the bands
  * it needs and keeps the existing x existing quadratic bulk unformed.
  *
  * Exactly-once caveat: parquet `append` is not transactional, so a batch
  * retried after a mid-write failure can duplicate its survivors.
  * Production targets a transactional table format or partitions output by
  * `batchId` and overwrites; the streaming checkpoint already provides the
  * replay-detection half.
  */
object IngestStream {

  /** Starts the ingestion query. `corpusDir` must exist and hold the seed
    * corpus; incoming ids must be disjoint from corpus ids (the
    * [[Dedup.incrementalNearDups]] contract).
    *
    * `manifestPath` (round-11 verdict item 8) keeps a
    * [[graft.sources.Manifest]] catalog current per micro-batch — the
    * streaming twin of `ParquetSink(manifestKeys)`: after each batch's
    * survivors append, only the part files THAT batch produced are
    * footer-scanned (a path diff against the manifest), so the catalog
    * tracks a growing corpus with zero data-page reads and no rescan. A
    * replayed batch after a mid-write failure re-diffs by path, so the
    * manifest converges on whatever files actually exist (the exactly-once
    * caveat above applies to the data, not additionally to the catalog).
    *
    * `manifestCompactEvery` (round 13): every incremental update appends
    * one tiny manifest parquet file, and streaming is the path where that
    * compounds — a long-lived query fragments the catalog and breaks its
    * own (table, mins) range layout, so manifest scans stop pruning. Every
    * N-th batch the catalog is rewritten into the canonical compacted form
    * ([[graft.sources.Manifest.compact]]); readers ride out the rewrite
    * window via the manifest's built-in read retry. 0 disables. */
  def dedupIngest(incoming: DataFrame, corpusDir: String, checkpointDir: String,
                  idCol: String = "doc_id", textCol: String = "text",
                  threshold: Double = 0.5,
                  trigger: Trigger = Trigger.AvailableNow(),
                  manifestPath: Option[String] = None,
                  manifestKeys: Seq[String] = Seq("doc_id"),
                  manifestCompactEvery: Int = 16): StreamingQuery =
    incoming.writeStream
      .foreachBatch { (batch: Dataset[Row], batchId: Long) =>
        val spark = batch.sparkSession
        val scope = new CacheScope
        try {
          val corpus = spark.read.parquet(corpusDir)
          val kills = Dedup.incrementalNearDups(
            corpus, batch.toDF(), idCol, textCol, threshold, scope = scope)
            .select(col(idCol))
          batch.toDF().join(kills, Seq(idCol), "left_anti")
            .write.mode("append").parquet(corpusDir)
          manifestPath.foreach { mp =>
            val table = new org.apache.hadoop.fs.Path(corpusDir)
              .getName.stripSuffix(".parquet")
            graft.sources.Manifest.updateDir(
              spark, corpusDir, table, manifestKeys, mp)
            if (manifestCompactEvery > 0 &&
                (batchId + 1) % manifestCompactEvery == 0)
              graft.sources.Manifest.compact(spark, mp)
          }
        } finally scope.release()
      }
      .option("checkpointLocation", checkpointDir)
      .trigger(trigger)
      .start()
}
