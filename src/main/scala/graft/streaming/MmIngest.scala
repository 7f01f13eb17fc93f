package graft.streaming

import graft.operators.{Dedup, Multimodal}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col
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
  * `probeBatch` is byte-for-byte the function `foreachBatch` runs, so the
  * batch gate and the live query execute the identical plan per step.
  *
  * Delivery contract: `foreachBatch` is at-least-once — a replayed batch
  * re-probes its own appended fingerprints at hamming 0 and drops itself
  * (the dedup step is idempotent), but the `outPath` append is not;
  * production sinks write per-epoch directories or idempotent overwrites
  * keyed by `batchId` (the [[DedupIngest]] note, verbatim — same sink
  * caveat, same fix).
  *
  * 100 TB shape: payload bytes live only inside the per-batch decode
  * stage; the index is the big side and never moves (bucket-ordered scan,
  * no exchange); per-batch shuffle is O(batch) fragment postings. */
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

  /** The composed ingest DAG run LIVE: mixed-modality micro-batches →
    * decode once → family-keyed index probe → survivors extend output
    * and index before the epoch commits. One bucketed index serves every
    * family (the family is a residual predicate on the `bk` bucket join).
    * Same at-least-once sink caveat as [[start]]. */
  def startComposed(incoming: DataFrame, indexTable: String, outPath: String,
                    checkpoint: String, buckets: Int = 8, maxHamming: Int = 3,
                    availableNow: Boolean = false): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Dedup.requireMaterializing(spark, "MmIngest.startComposed")
        val surv = probeBatchComposed(spark.table(indexTable), batch, maxHamming)
          .where(col("survives"))
          .select(col("id"), col("grp").as("family"), col("sh").as("phash"))
        surv.write.mode("append").parquet(outPath)
        Dedup.appendHammingIndexKeyed(
          surv.select(col("id"), col("phash").as("sh"),
                      col("family").as("grp")),
          indexTable, buckets, maxHamming)
        ()
      }
      .start()
  }

  def start(incoming: DataFrame, indexTable: String, outPath: String,
            checkpoint: String, buckets: Int = 8, maxHamming: Int = 3,
            availableNow: Boolean = false): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Dedup.requireMaterializing(spark, "MmIngest.start")
        val surv = probeBatch(spark.table(indexTable), batch, maxHamming)
          .where(col("survives")).select(col("id"), col("sh").as("phash"))
        surv.write.mode("append").parquet(outPath)
        Dedup.appendHammingIndex(
          surv.select(col("id"), col("phash").as("sh")), indexTable,
          buckets, maxHamming)
        ()
      }
      .start()
  }
}
