package graft.streaming

import graft.config.GraftConfig
import graft.event.Event

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}

/** User-extensible component SPI — the reference loads EVERY component type
  * reflectively by class name (`core/src/main/scala/atiesh/utils/
  * ComponentLoader.scala:7-20`, used for sources at `Source.scala:123-149`,
  * sinks at `Sink.scala:57-77`, extensions at `Extension.scala:53-73`).
  * A pipeline config section with `fqcn = "com.acme.MySource"` and no
  * `type` key instantiates the named class (constructor `(GraftConfig)` or
  * `()`) and delegates construction of the stream / writer to it. */
trait SourcePlugin {
  /** Build the streaming event Dataset this source produces. */
  def build(spark: SparkSession, cfg: GraftConfig): Dataset[Event]
}

trait SinkPlugin {
  /** Build the per-micro-batch writer for this sink. */
  def build(cfg: GraftConfig): DataFrame => Unit
}

/** A sink plugin whose writer needs the EPOCH (the foreachBatch batchId) —
  * the SPI for exactly-once stages like [[MmIngestSink]], whose per-epoch
  * output overwrite and replay-guarded index append are keyed by it. The
  * pipeline assembler passes the batchId of the enclosing micro-batch
  * through; a plain [[SinkPlugin]] keeps ignoring it. */
trait EpochSinkPlugin {
  /** Build the per-micro-batch writer; the Long is the epoch/batchId. */
  def build(cfg: GraftConfig): (DataFrame, Long) => Unit
}
