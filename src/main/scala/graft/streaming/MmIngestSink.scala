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
  * bounds index small files and REQUIRES `layout = gen` — the crash-safe
  * generational layout ([[graft.operators.GenIndex]], compactions swap
  * marker-committed generations instead of rewriting in place; a
  * configured long-running stream never gets the in-place rewrite's
  * mid-crash window).
  *
  * The epoch-stamped keyed index is AUTO-INITIALIZED at `index-path` on
  * the first batch — but only when NO index exists there yet. A restart
  * loses the session catalog, not the files: if `index-path` already
  * holds data (a committed generation, or part-files on the single-path
  * layout), the sink RE-REGISTERS the bucketed table over the existing
  * files instead of re-initializing — an init here would overwrite the
  * accumulated index and silently forget every accepted fingerprint. */
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
    val foldOutputEvery = cfg.getInt("fold-output-every", 0)
    val gen = cfg.getString("layout", "flat") == "gen"
    // the in-place rewrite's crash window (old files deleted before new
    // ones commit) is acceptable only for driver-sequential batch loops;
    // a LONG-RUNNING configured stream that compacts must use the
    // generational layout or a crash mid-compaction destroys the index
    // and the restart auto-init silently rebuilds it empty
    require(compactEvery <= 0 || gen,
      s"sink '$table': compact-every = $compactEvery needs layout = gen — " +
      "in-place compaction can window the index under a mid-rewrite crash")
    val idExpr = cfg.getString("id-expr", "cast(headers['id'] as bigint)")
    val payloadExpr = cfg.getString("payload-expr", "unbase64(body)")
    // ONE step closure across batches: the resume guard inside
    // ingestEpochComposed runs once per writer lifetime, not per epoch
    var step: (DataFrame, Long) => Unit = null
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (step == null) {
        if (!spark.catalog.tableExists(table))
          graft.operators.GenIndex.openOrInit(spark, table, indexPath,
              "bk", buckets, gen) {
            Dedup.initHammingIndexKeyedEpoch(
              spark.range(0).selectExpr("id", "cast(0 as long) as sh",
                "cast('' as string) as grp"),
              table, indexPath, buckets, maxHamming); ()
          } {
            Dedup.initHammingIndexKeyedEpochGen(
              spark.range(0).selectExpr("id", "cast(0 as long) as sh",
                "cast('' as string) as grp"),
              table, indexPath, buckets, maxHamming); ()
          }
        step = MmIngest.ingestEpochComposed(table, outPath, buckets,
          maxHamming, indexPath, compactEvery, foldOutputEvery)
      }
      step(batch.select(expr(idExpr).as("id"),
                        expr(payloadExpr).as("payload")), batchId)
    }
  }
}
