package graft.streaming

import graft.config.GraftConfig
import graft.operators.Dedup

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.expr

/** The embedding ingest loop as a CONFIG-DECLARED sink — the
  * [[MmIngestSink]] pattern for the semantic-dedup member of the ingest
  * triad:
  *
  * {{{
  * graft {
  *   source { vectors { fqcn = "...vector source...", sinks = [ingest] } }
  *   sink {
  *     ingest {
  *       type = embed-ingest         // or fqcn = "graft.streaming.EmbedIngestSink"
  *       index-table = graft_emb_index
  *       index-path  = "/data/emb_index"
  *       out-path    = "/data/emb_accepted"
  *       buckets = 8, threshold = 0.95, lsh-bits = 8, dim = 64
  *       compact-every = 0, layout = flat   // or gen (crash-safe swap)
  *       id-expr  = "cast(headers['id'] as bigint)"
  *       vec-expr = "cast(from_json(body, 'array<float>') as array<float>)"
  *     }
  *   }
  * }
  * }}}
  *
  * Each routed micro-batch is projected to `(id, vec)` by the two
  * configured SQL expressions over the Event wire schema (vectors ride as
  * a JSON float array in the body by default), then runs one
  * [[EmbedIngest.ingestEpoch]] step. Exactly-once per the epoch-layout
  * contract; same restart rule as [[MmIngestSink]]: when `index-path`
  * already holds an index, the sink RE-REGISTERS it from the files
  * (generation marker or bucketed part-files) instead of re-initializing
  * over the accumulated vectors. */
class EmbedIngestSink extends EpochSinkPlugin {
  override def build(cfg: GraftConfig): (DataFrame, Long) => Unit =
    EmbedIngestSink.writer(cfg)
}

object EmbedIngestSink {
  def writer(cfg: GraftConfig): (DataFrame, Long) => Unit = {
    val table = cfg.getString("index-table")
    val indexPath = cfg.getString("index-path")
    val outPath = cfg.getString("out-path")
    val buckets = cfg.getInt("buckets", 8)
    val threshold = cfg.getDouble("threshold", 0.95)
    val lshBits = cfg.getInt("lsh-bits", 8)
    val dim = cfg.getInt("dim", 64)
    val compactEvery = cfg.getInt("compact-every", 0)
    val foldOutputEvery = cfg.getInt("fold-output-every", 0)
    val gen = cfg.getString("layout", "flat") == "gen"
    // see MmIngestSink: a configured long-running stream that compacts
    // must use the crash-safe generational layout
    require(compactEvery <= 0 || gen,
      s"sink '$table': compact-every = $compactEvery needs layout = gen — " +
      "in-place compaction can window the index under a mid-rewrite crash")
    val idExpr = cfg.getString("id-expr", "cast(headers['id'] as bigint)")
    val vecExpr = cfg.getString("vec-expr",
      "cast(from_json(body, 'array<float>') as array<float>)")
    // ONE step closure across batches (resume guard once per writer)
    var step: (DataFrame, Long) => Unit = null
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (step == null) {
        if (!spark.catalog.tableExists(table))
          graft.operators.GenIndex.openOrInit(spark, table, indexPath,
              "bucket", buckets, gen) {
            Dedup.initEmbedIndexEpoch(
              spark.range(0).selectExpr("id", "cast(null as array<float>) as vec"),
              table, indexPath, buckets, lshBits, dim); ()
          } {
            Dedup.initEmbedIndexEpochGen(
              spark.range(0).selectExpr("id", "cast(null as array<float>) as vec"),
              table, indexPath, buckets, lshBits, dim); ()
          }
        step = EmbedIngest.ingestEpoch(table, outPath, buckets, threshold,
          lshBits, dim, indexPath, compactEvery, foldOutputEvery)
      }
      step(batch.select(expr(idExpr).as("id"), expr(vecExpr).as("vec")),
        batchId)
    }
  }
}
