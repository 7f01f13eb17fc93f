package graft.streaming

import graft.operators.{Dedup, Multimodal}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming multimodal ingestion with on-the-fly fingerprint dedup — the
  * live twin of [[graft.operators.Dedup.hammingIngest]], completing the
  * batch/live symmetry the repo keeps for every index-probing path
  * (`dedup_incremental_indexed` ↔ `stream_dedup_ingest`, `sim_ivf_indexed`
  * ↔ `stream_ivf_probe`): each micro-batch of `(id, payload)` media rows
  * is DECODED ONCE (real ImageIO dHash), probed against the bucketed
  * fragment index of every fingerprint ACCEPTED so far (zero exchange on
  * the index side — the PlanSpec-pinned shape), and the surviving rows
  * extend both the output and the index before the epoch commits.
  * `ingestEpoch` is byte-for-byte the function `foreachBatch` runs, so the
  * batch gate and the live query execute the identical plan per step.
  *
  * Delivery contract — effective EXACTLY-ONCE over the at-least-once
  * `foreachBatch` (the epoch-stamped layout of
  * [[graft.operators.Dedup.initHammingIndexEpoch]]):
  *   - the probe reads only `epoch < batchId`, so a replayed batch never
  *     sees its own crashed attempt's postings and recomputes the
  *     IDENTICAL survivor decision;
  *   - survivors land in `outPath/epoch=<batchId>` with OVERWRITE — a
  *     replay rewrites the same rows in place (readers discover `epoch`
  *     as a partition column and project it away);
  *   - the index append is replay-guarded by
  *     [[graft.operators.Dedup.epochAppended]] — postings are never
  *     duplicated.
  * Any crash point (after output, after index, mid-write) therefore
  * replays to the same end state; the kill-and-restart spec drives a real
  * checkpointed failure through every window.
  *
  * 100 TB shape: payload bytes live only inside the per-batch decode
  * stage; the index is the big side and never moves (bucket-ordered scan,
  * no exchange); per-batch shuffle is O(batch) fragment postings. Index
  * file count is bounded by `compactEvery` (every N epochs the bucketed
  * table rewrites into one file set per bucket), which REQUIRES the
  * generational layout ([[graft.operators.GenIndex.init]]): the swap
  * compacts crash-safely — fresh generation directory + atomic
  * `_COMMITTED` marker flip, the live files never modified, so a JVM loss
  * mid-compaction cannot window the index. The in-place rewrite the
  * driver-sequential batch loops accept is rejected here on the first
  * batch — it can destroy a long-running stream's only index copy and
  * discards the per-epoch commit markers. Output directory count is
  * bounded by `foldOutputEvery` ([[IngestOutput]]). */
object MmIngest {

  /** One micro-batch step: decode → fingerprint → probe the index —
    * exactly what the stream executes per epoch. Undecodable payloads
    * (null fingerprint) are dropped before blocking, the
    * [[graft.operators.Multimodal.perceptualNearDup]] contract. */
  def probeBatch(index: DataFrame, batch: DataFrame,
                 maxHamming: Int): DataFrame =
    Dedup.hammingSurvivorsIndexed(
      Multimodal.perceptualHash(batch)
        .where(col("phash").isNotNull)
        .select(col("id"), col("phash").as("sh")),
      index, maxHamming)

  /** [[probeBatch]] without the eager cut (lazy decision plan + the caches
    * the caller releases after ITS barrier — the per-epoch parquet write).
    * See [[graft.operators.Dedup.hammingSurvivorsIndexedLazy]]. */
  private def probeBatchLazy(index: DataFrame, batch: DataFrame,
                             maxHamming: Int): (DataFrame, Seq[DataFrame]) =
    Dedup.hammingSurvivorsIndexedLazy(
      Multimodal.perceptualHash(batch)
        .where(col("phash").isNotNull)
        .select(col("id"), col("phash").as("sh")),
      index, maxHamming)

  /** One COMPOSED micro-batch step — the live form of
    * [[graft.operators.Multimodal.ingestPipeline]]'s front half: ONE
    * decode pass sniff-routes every payload and fingerprints it in place
    * (all modalities), then the family-keyed fragment index is probed.
    * Payloads that route but fail to decode (null fingerprint) drop
    * before blocking; 'other' rows never carry a fingerprint. */
  def probeBatchComposed(index: DataFrame, batch: DataFrame,
                         maxHamming: Int): DataFrame =
    Dedup.hammingSurvivorsIndexedKeyed(
      Multimodal.ingestFingerprints(batch).toDF()
        .where(col("fp").isNotNull)
        .select(col("id"), col("fp").as("sh"), col("family").as("grp")),
      index, maxHamming)

  /** Lazy twin of [[probeBatchComposed]] — see [[probeBatchLazy]]. */
  private def probeBatchComposedLazy(index: DataFrame, batch: DataFrame,
                                     maxHamming: Int): (DataFrame, Seq[DataFrame]) =
    Dedup.hammingSurvivorsIndexedKeyedLazy(
      Multimodal.ingestFingerprints(batch).toDF()
        .where(col("fp").isNotNull)
        .select(col("id"), col("fp").as("sh"), col("family").as("grp")),
      index, maxHamming)

  /** Idempotent per-epoch survivor write: `outPath/epoch=<batchId>`,
    * overwrite — replaying the epoch rewrites the same rows in place. */
  def writeEpoch(surv: DataFrame, outPath: String, batchId: Long): Unit =
    surv.write.mode("overwrite").parquet(s"$outPath/epoch=$batchId")

  /** [[writeEpoch]] as the epoch's MATERIALIZATION BARRIER: computes the
    * lazy survivor plan directly into the epoch directory (ONE job —
    * previously a localCheckpoint job computed the decision record and the
    * write job merely copied blocks), releases the probe's persisted
    * intermediates, and returns the survivors re-read from the files just
    * written, so the index append that follows consumes durable storage
    * instead of re-running the probe. Crash contract unchanged: the write
    * is still the epoch's first side effect, still an idempotent overwrite,
    * and a replay recomputes the identical decision (the probe reads only
    * `epoch < batchId`). The read-back carries an explicit schema — an
    * all-duplicate epoch writes zero data files, which schema inference
    * would reject. */
  private[streaming] def writeEpochBarrier(survLazy: DataFrame,
                                           caches: Seq[DataFrame],
                                           outPath: String,
                                           batchId: Long): DataFrame = {
    writeEpoch(survLazy, outPath, batchId)
    caches.foreach(_.unpersist())
    survLazy.sparkSession.read.schema(survLazy.schema)
      .parquet(s"$outPath/epoch=$batchId")
  }

  /** The full per-epoch step [[start]]'s `foreachBatch` runs (public so
    * the kill-and-restart spec can replay it from any crash window):
    * resume-guard (first batch of this writer only — a batchId behind the
    * index's max epoch means the checkpoint does not belong to this
    * index, [[graft.operators.GenIndex.requireEpochAhead]]) → probe
    * (strictly-earlier epochs only) → epoch-keyed output overwrite →
    * guarded index append → optional periodic index compaction →
    * optional periodic output folding ([[IngestOutput.fold]], epochs
    * strictly before this batch). */
  def ingestEpoch(indexTable: String, outPath: String, buckets: Int,
                  maxHamming: Int, indexPath: String = null,
                  compactEvery: Int = 0,
                  foldOutputEvery: Int = 0): (DataFrame, Long) => Unit = {
    var validated = false
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      Dedup.requireMaterializing(spark, "MmIngest.ingestEpoch")
      if (!validated) {
        graft.operators.GenIndex.validateFirstBatch(spark, indexTable, batchId, indexPath, compactEvery)
        validated = true
      }
      val (decision, caches) = probeBatchLazy(
          spark.table(indexTable).where(col("epoch") < lit(batchId)),
          batch, maxHamming)
      val surv = writeEpochBarrier(
        decision.where(col("survives")).select(col("id"), col("sh").as("phash")),
        caches, outPath, batchId)
      Dedup.appendHammingIndexEpoch(
        surv.select(col("id"), col("phash").as("sh")), indexTable,
        buckets, maxHamming, batchId)
      if (compactEvery > 0 && indexPath != null &&
          (batchId + 1) % compactEvery == 0)
        graft.operators.GenIndex.compactAuto(spark, indexTable, indexPath,
          "bk", buckets)
      if (foldOutputEvery > 0 && (batchId + 1) % foldOutputEvery == 0)
        IngestOutput.fold(spark, outPath, batchId - 1)
    }
  }

  /** [[ingestEpoch]] for the composed DAG: one sniff-routed decode pass,
    * family-keyed probe, `(id, family, phash)` survivors. */
  def ingestEpochComposed(indexTable: String, outPath: String, buckets: Int,
                          maxHamming: Int, indexPath: String = null,
                          compactEvery: Int = 0,
                          foldOutputEvery: Int = 0): (DataFrame, Long) => Unit = {
    var validated = false
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      Dedup.requireMaterializing(spark, "MmIngest.ingestEpochComposed")
      if (!validated) {
        graft.operators.GenIndex.validateFirstBatch(spark, indexTable, batchId, indexPath, compactEvery)
        validated = true
      }
      val (decision, caches) = probeBatchComposedLazy(
          spark.table(indexTable).where(col("epoch") < lit(batchId)),
          batch, maxHamming)
      val surv = writeEpochBarrier(
        decision.where(col("survives"))
          .select(col("id"), col("grp").as("family"), col("sh").as("phash")),
        caches, outPath, batchId)
      Dedup.appendHammingIndexKeyedEpoch(
        surv.select(col("id"), col("phash").as("sh"),
                    col("family").as("grp")),
        indexTable, buckets, maxHamming, batchId)
      if (compactEvery > 0 && indexPath != null &&
          (batchId + 1) % compactEvery == 0)
        graft.operators.GenIndex.compactAuto(spark, indexTable, indexPath,
          "bk", buckets)
      if (foldOutputEvery > 0 && (batchId + 1) % foldOutputEvery == 0)
        IngestOutput.fold(spark, outPath, batchId - 1)
    }
  }

  /** The composed ingest DAG run LIVE: mixed-modality micro-batches →
    * decode once → family-keyed index probe → survivors extend output
    * and index before the epoch commits. One bucketed index serves every
    * family (the family is a residual predicate on the `bk` bucket join).
    * Index table must be the epoch-stamped layout
    * ([[graft.operators.Dedup.initHammingIndexKeyedEpoch]], or the
    * `...Gen` variant for crash-safe compaction). RESTARTS: init is
    * destructive — a resumed stream must re-register the existing index
    * ([[graft.operators.GenIndex.open]] / `register`) instead of
    * re-initializing, or every accepted fingerprint is forgotten (the
    * config sink [[MmIngestSink]] does this automatically). */
  def startComposed(incoming: DataFrame, indexTable: String, outPath: String,
                    checkpoint: String, buckets: Int = 8, maxHamming: Int = 3,
                    availableNow: Boolean = false, indexPath: String = null,
                    compactEvery: Int = 0,
                    foldOutputEvery: Int = 0): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch(ingestEpochComposed(indexTable, outPath, buckets,
        maxHamming, indexPath, compactEvery, foldOutputEvery))
      .start()
  }

  def start(incoming: DataFrame, indexTable: String, outPath: String,
            checkpoint: String, buckets: Int = 8, maxHamming: Int = 3,
            availableNow: Boolean = false, indexPath: String = null,
            compactEvery: Int = 0,
            foldOutputEvery: Int = 0): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch(ingestEpoch(indexTable, outPath, buckets, maxHamming,
        indexPath, compactEvery, foldOutputEvery))
      .start()
  }
}
