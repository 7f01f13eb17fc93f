package graft.streaming

import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

/** Streaming crawl ingestion with on-the-fly corpus dedup: each micro-batch
  * keeps only documents that near-duplicate neither the ACCEPTED corpus so
  * far (probed via the bucketed posting index — zero exchange on the corpus
  * side) nor a smaller-id document of the same batch, appends the survivors
  * to the output and their postings to the index, then commits the epoch.
  * `foreachBatch` twin of [[graft.operators.Dedup.dedupIngest]] — the spec
  * drives both over identical batch splits and asserts equal survivor sets.
  *
  * Delivery contract: `foreachBatch` is at-least-once — on recovery a batch
  * can REPLAY after its side effects committed. The index append makes the
  * dedup step itself idempotent (a replayed document near-duplicates its own
  * postings at jaccard 1.0 and is dropped), but the `outPath` append of the
  * replayed batch's interleaved non-survivors is not — production sinks
  * should write per-epoch directories or an idempotent overwrite keyed by
  * `batchId` (Spark's own recommendation for file sinks under foreachBatch).
  * The gate verifies the BATCH twin; this wrapper is spec-verified live. */
object DedupIngest {

  def start(incoming: DataFrame, idCol: String, textCol: String,
            indexTable: String, outPath: String, checkpoint: String,
            buckets: Int = 8, shingleN: Int = 3,
            threshold: Double = 0.5, availableNow: Boolean = false): StreamingQuery = {
    val writer = incoming.writeStream
      .outputMode("append")
      .option("checkpointLocation", checkpoint)
    // drain-and-stop mode for gate/backfill runs; the default trigger keeps
    // the query live for continuous ingestion
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        val spark = batch.sparkSession
        Dedup.requireMaterializing(spark, "DedupIngest.start")
        val surv = Dedup.incrementalSurvivorsIndexed(
          batch, spark.table(indexTable), idCol, textCol,
          shingleN, threshold, Long.MaxValue)
        surv.write.mode("append").parquet(outPath)
        Dedup.appendPostingIndex(surv, idCol, textCol, indexTable,
          buckets, shingleN)
        ()
      }
      .start()
  }
}
