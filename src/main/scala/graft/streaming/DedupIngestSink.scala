package graft.streaming

import graft.config.GraftConfig
import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** The text dedup-ingest loop as a CONFIG-DECLARED sink — completing the
  * HOCON ingest triad ([[MmIngestSink]] modality fingerprints,
  * [[EmbedIngestSink]] embeddings, this sink text postings): the
  * reference's identity is pipelines wired from HOCON sections, so every
  * member of the triad must be declarable the same way.
  *
  * {{{
  * graft {
  *   source { crawl { fqcn = "...document source...", sinks = [ingest] } }
  *   sink {
  *     ingest {
  *       type = dedup-ingest         // or fqcn = "graft.streaming.DedupIngestSink"
  *       index-table = graft_doc_index
  *       index-path  = "/data/doc_index"
  *       out-path    = "/data/doc_accepted"
  *       buckets = 8, shingle-n = 3, threshold = 0.5
  *       compact-every = 0, layout = flat   // or gen (crash-safe swap)
  *       fold-output-every = 0              // >0: periodic output folding
  *       id-expr   = "cast(headers['id'] as bigint)"
  *       text-expr = "body"
  *     }
  *   }
  * }
  * }}}
  *
  * Each routed micro-batch is projected to `(id, text)` by the two
  * configured SQL expressions over the Event wire schema (document text
  * rides in the body by default), then runs one
  * [[DedupIngest.ingestEpoch]] step: probe the bucketed posting index of
  * every document ACCEPTED so far (zero index-side exchange) → survivors
  * extend `out-path/epoch=<batchId>` and the marker-guarded index.
  * Exactly-once per the epoch-layout contract; `compact-every = N`
  * REQUIRES `layout = gen` (the crash-safe generational swap — a
  * configured long-running stream never gets the in-place rewrite's
  * mid-crash window, and in-place rewrites would discard the epoch commit
  * markers). Same restart rule as the other two sinks: when `index-path`
  * already holds an index, the sink RE-REGISTERS it from the files
  * (generation marker or bucketed part-files) instead of re-initializing
  * over the accumulated corpus. */
class DedupIngestSink extends EpochSinkPlugin {
  override def build(cfg: GraftConfig): (DataFrame, Long) => Unit =
    DedupIngestSink.writer(cfg)
}

object DedupIngestSink {
  def writer(cfg: GraftConfig): (DataFrame, Long) => Unit = {
    val table = cfg.getString("index-table")
    val indexPath = cfg.getString("index-path")
    val outPath = cfg.getString("out-path")
    val buckets = cfg.getInt("buckets", 8)
    val shingleN = cfg.getInt("shingle-n", 3)
    val threshold = cfg.getDouble("threshold", 0.5)
    val compactEvery = cfg.getInt("compact-every", 0)
    val foldOutputEvery = cfg.getInt("fold-output-every", 0)
    val gen = cfg.getString("layout", "flat") == "gen"
    // see MmIngestSink: a configured long-running stream that compacts
    // must use the crash-safe generational layout (also enforced on the
    // first batch by GenIndex.validateFirstBatch — this duplicate check
    // fails at ASSEMBLY, before a stream ever starts)
    require(compactEvery <= 0 || gen,
      s"sink '$table': compact-every = $compactEvery needs layout = gen — " +
      "in-place compaction can window the index under a mid-rewrite crash")
    val idExpr = cfg.getString("id-expr", "cast(headers['id'] as bigint)")
    val textExpr = cfg.getString("text-expr", "body")
    // ONE step closure across batches (resume guard once per writer)
    var step: (DataFrame, Long) => Unit = null
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (step == null) {
        if (!spark.catalog.tableExists(table))
          graft.operators.GenIndex.openOrInit(spark, table, indexPath,
              "h", buckets, gen) {
            Dedup.initPostingIndexEpoch(
              spark.range(0).selectExpr("id", "cast('' as string) as text"),
              "id", "text", table, indexPath, buckets, shingleN); ()
          } {
            Dedup.initPostingIndexEpochGen(
              spark.range(0).selectExpr("id", "cast('' as string) as text"),
              "id", "text", table, indexPath, buckets, shingleN); ()
          }
        step = DedupIngest.ingestEpoch("id", "text", table, outPath,
          buckets, shingleN, threshold, indexPath, compactEvery,
          foldOutputEvery)
      }
      step(batch.select(expr(idExpr).as("id"), expr(textExpr).as("text")),
        batchId)
    }
  }
}
