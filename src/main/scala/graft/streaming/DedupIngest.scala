package graft.streaming

import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming crawl ingestion with on-the-fly corpus dedup: each micro-batch
  * keeps only documents that near-duplicate neither the ACCEPTED corpus so
  * far (probed via the bucketed posting index — zero exchange on the corpus
  * side) nor a smaller-id document of the same batch, appends the survivors
  * to the output and their postings to the index, then commits the epoch.
  * `foreachBatch` twin of [[graft.operators.Dedup.dedupIngest]] — the spec
  * drives both over identical batch splits and asserts equal survivor sets.
  *
  * Delivery contract — effective EXACTLY-ONCE over the at-least-once
  * `foreachBatch`, via the epoch-stamped posting-index layout
  * ([[graft.operators.Dedup.initPostingIndexEpoch]]): the probe reads only
  * `epoch < batchId` (a replayed batch recomputes the identical survivor
  * decision instead of near-duplicating its own crashed attempt), survivors
  * overwrite `outPath/epoch=<batchId>` (replay rewrites the same rows), and
  * the index append is replay-guarded — duplicate postings would DOUBLE the
  * Jaccard intersection counts, so the guard is correctness here, not just
  * hygiene. The kill-and-restart spec replays a real checkpointed failure
  * through each crash window.
  *
  * RESTARTS: `initPostingIndexEpoch`/`...Gen` are destructive — a resumed
  * stream must re-register the existing index from its files
  * ([[graft.operators.GenIndex.open]] / `register`, key `h`) instead of
  * re-initializing, or every accepted document's postings are forgotten. */
object DedupIngest {

  /** The full per-epoch step [[start]]'s `foreachBatch` runs (public for
    * the kill-and-restart spec): probe strictly-earlier epochs → epoch-
    * keyed output overwrite → guarded posting append → optional periodic
    * compaction (every `compactEvery` epochs; bounds the per-micro-batch
    * small files exactly like MmIngest's hook — `compactEvery > 0`
    * REQUIRES the generational layout, enforced on the first batch for
    * config and programmatic callers alike: the in-place rewrite can
    * destroy the only index copy mid-crash and discards the epoch commit
    * markers) → optional periodic output folding
    * ([[IngestOutput.fold]]). */
  def ingestEpoch(idCol: String, textCol: String, indexTable: String,
                  outPath: String, buckets: Int, shingleN: Int,
                  threshold: Double, indexPath: String = null,
                  compactEvery: Int = 0,
                  foldOutputEvery: Int = 0): (DataFrame, Long) => Unit = {
    var validated = false
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      Dedup.requireMaterializing(spark, "DedupIngest.ingestEpoch")
      if (!validated) {
        graft.operators.GenIndex.validateFirstBatch(spark, indexTable, batchId, indexPath,
          compactEvery)
        validated = true
      }
      // the epoch parquet write is the materialization barrier: the write
      // job computes the survivor decision, the index append reads the
      // files back — one fewer job per epoch than cut-then-write
      // (MmIngest.writeEpochBarrier)
      val (survLazy, caches) = Dedup.incrementalSurvivorsIndexedLazy(
        batch, spark.table(indexTable).where(col("epoch") < lit(batchId)),
        idCol, textCol, shingleN, threshold, Long.MaxValue)
      val surv = MmIngest.writeEpochBarrier(survLazy, caches, outPath, batchId)
      Dedup.appendPostingIndexEpoch(surv, idCol, textCol, indexTable,
        buckets, shingleN, batchId)
      if (compactEvery > 0 && indexPath != null &&
          (batchId + 1) % compactEvery == 0)
        graft.operators.GenIndex.compactAuto(spark, indexTable, indexPath,
          "h", buckets)
      if (foldOutputEvery > 0 && (batchId + 1) % foldOutputEvery == 0)
        IngestOutput.fold(spark, outPath, batchId - 1)
    }
  }

  def start(incoming: DataFrame, idCol: String, textCol: String,
            indexTable: String, outPath: String, checkpoint: String,
            buckets: Int = 8, shingleN: Int = 3,
            threshold: Double = 0.5, availableNow: Boolean = false,
            indexPath: String = null, compactEvery: Int = 0,
            foldOutputEvery: Int = 0): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    // drain-and-stop mode for gate/backfill runs; the default trigger keeps
    // the query live for continuous ingestion
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch(ingestEpoch(idCol, textCol, indexTable, outPath,
        buckets, shingleN, threshold, indexPath, compactEvery,
        foldOutputEvery))
      .start()
  }
}
