package graft.streaming

import graft.config.GraftConfig
import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** The flagship composed multimodal ingest DAG as a CONFIG-DECLARED sink —
  * the reference's whole identity is pipelines wired from HOCON sections
  * (`AtieshServer.scala:116-164`), so the round-13 flagship must be
  * declarable the same way, not only assembled in code:
  *
  * {{{
  * graft {
  *   source { media { fqcn = "...payload source...", sinks = [ingest] } }
  *   sink {
  *     ingest {
  *       type = mm-ingest            // or fqcn = "graft.streaming.MmIngestSink"
  *       index-table = graft_mm_index
  *       index-path  = "/data/mm_index"
  *       out-path    = "/data/mm_accepted"
  *       buckets = 8, max-hamming = 3, compact-every = 0
  *       id-expr      = "cast(headers['id'] as bigint)"
  *       payload-expr = "unbase64(body)"
  *     }
  *   }
  * }
  * }}}
  *
  * Each routed micro-batch is projected to `(id, payload)` by the two
  * configured SQL expressions over the Event wire schema (`body`,
  * `headers` — payload bytes ride base64 in the body by default, matching
  * the reference's opaque-bytes event contract), then runs one
  * [[MmIngest.ingestEpochComposed]] step: sniff-route decode once →
  * family-keyed fragment-index probe → survivors extend
  * `out-path/epoch=<batchId>` and the replay-guarded index. Exactly-once
  * per the epoch-layout contract ([[MmIngest]]); `compact-every = N`
  * bounds index small files. The epoch-stamped keyed index is
  * AUTO-INITIALIZED at `index-path` on the first batch if the table does
  * not exist (idempotent; a restart reuses the existing one). */
class MmIngestSink extends EpochSinkPlugin {
  override def build(cfg: GraftConfig): (DataFrame, Long) => Unit =
    MmIngestSink.writer(cfg)
}

object MmIngestSink {
  def writer(cfg: GraftConfig): (DataFrame, Long) => Unit = {
    val table = cfg.getString("index-table")
    val indexPath = cfg.getString("index-path")
    val outPath = cfg.getString("out-path")
    val buckets = cfg.getInt("buckets", 8)
    val maxHamming = cfg.getInt("max-hamming", 3)
    val compactEvery = cfg.getInt("compact-every", 0)
    val idExpr = cfg.getString("id-expr", "cast(headers['id'] as bigint)")
    val payloadExpr = cfg.getString("payload-expr", "unbase64(body)")
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (!spark.catalog.tableExists(table))
        Dedup.initHammingIndexKeyedEpoch(
          spark.range(0).selectExpr("id", "cast(0 as long) as sh",
            "cast('' as string) as grp"),
          table, indexPath, buckets, maxHamming)
      MmIngest.ingestEpochComposed(table, outPath, buckets, maxHamming,
        indexPath, compactEvery)(
        batch.select(expr(idExpr).as("id"), expr(payloadExpr).as("payload")),
        batchId)
    }
  }
}
