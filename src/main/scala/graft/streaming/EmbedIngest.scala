package graft.streaming

import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming embedding ingestion with on-the-fly semantic dedup — the
  * embedding member of the live ingest triad ([[DedupIngest]] text,
  * [[MmIngest]] modality fingerprints): each micro-batch of `(id, vec)`
  * vectors keeps only those whose cosine to every ACCEPTED vector sharing
  * their LSH bucket (probed via the persisted bucketed index — zero
  * exchange on the corpus side) and to every smaller-id bucket-mate of the
  * same batch stays below `threshold`, appends the survivors to the output
  * and their postings to the index, then commits the epoch.
  *
  * Delivery contract — effective EXACTLY-ONCE over the at-least-once
  * `foreachBatch`, identical machinery to the other two ingest sinks: the
  * probe reads only `epoch < batchId`, survivors overwrite
  * `outPath/epoch=<batchId>`, the index append is replay-guarded
  * ([[graft.operators.Dedup.epochAppended]]).
  *
  * RESTARTS: `initEmbedIndexEpoch`/`...Gen` are destructive — a resumed
  * stream must re-register the existing index from its files
  * ([[graft.operators.GenIndex.open]] / `register`, key `bucket`) instead
  * of re-initializing.
  *
  * 100 TB shape: the index is the big side and never moves (bucket-ordered
  * scan); per-batch shuffle is O(batch) single-bucket postings; index file
  * count is bounded by `compactEvery`, routed crash-safe on the
  * generational layout. */
object EmbedIngest {

  /** The full per-epoch step [[start]]'s `foreachBatch` runs (public for
    * specs): probe strictly-earlier epochs → epoch-keyed output overwrite
    * → guarded index append → optional periodic compaction.
    *
    * Malformed payloads — a null vector (e.g. an unparseable JSON body
    * upstream) or a wrong-dimension one — DROP row-level before blocking,
    * the same contract as MmIngest's undecodable payloads:
    * `hyperplaneBucket`'s fail-loud dimension guard is right for batch
    * analytics over a landed corpus, but one bad wire record must not
    * kill a live ingest epoch. */
  def ingestEpoch(indexTable: String, outPath: String, buckets: Int,
                  threshold: Double, lshBits: Int, dim: Int,
                  indexPath: String = null,
                  compactEvery: Int = 0,
                  foldOutputEvery: Int = 0): (DataFrame, Long) => Unit = {
    var validated = false
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      Dedup.requireMaterializing(spark, "EmbedIngest.ingestEpoch")
      if (!validated) {
        graft.operators.GenIndex.validateFirstBatch(spark, indexTable, batchId, indexPath,
          compactEvery)
        validated = true
      }
      val clean = batch.where(col("vec").isNotNull &&
        org.apache.spark.sql.functions.size(col("vec")) === lit(dim))
      // epoch parquet write as the materialization barrier — one fewer job
      // per epoch than cut-then-write (MmIngest.writeEpochBarrier)
      val (decision, caches) = Dedup.embedSurvivorsIndexedLazy(
          clean, spark.table(indexTable).where(col("epoch") < lit(batchId)),
          threshold, lshBits, dim)
      val surv = MmIngest.writeEpochBarrier(
        decision.where(col("survives")).select(col("id"), col("vec")),
        caches, outPath, batchId)
      Dedup.appendEmbedIndexEpoch(surv, indexTable, buckets, lshBits, dim,
        batchId)
      if (compactEvery > 0 && indexPath != null &&
          (batchId + 1) % compactEvery == 0)
        graft.operators.GenIndex.compactAuto(spark, indexTable, indexPath,
          "bucket", buckets)
      if (foldOutputEvery > 0 && (batchId + 1) % foldOutputEvery == 0)
        IngestOutput.fold(spark, outPath, batchId - 1)
    }
  }

  def start(incoming: DataFrame, indexTable: String, outPath: String,
            checkpoint: String, buckets: Int = 8, threshold: Double = 0.95,
            lshBits: Int = 8, dim: Int = 64, availableNow: Boolean = false,
            indexPath: String = null, compactEvery: Int = 0,
            foldOutputEvery: Int = 0): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch(ingestEpoch(indexTable, outPath, buckets, threshold,
        lshBits, dim, indexPath, compactEvery, foldOutputEvery))
      .start()
  }
}
