package graft.sources

import graft.config.GraftConfig
import graft.event.Event

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._

/** Source operators (SURVEY.md §2.1). Each reference source maps to a
  * Structured Streaming built-in; what the reference hand-rolls (offset
  * tracking, commit cadence, rebalance handling, seek flags, per-file read
  * state) is subsumed by Spark's checkpointed offset management, so the
  * code here is thin: option mapping + the event-shape projection.
  */
object Sources {

  private implicit val eventEnc = Encoders.product[Event]

  /** Project any 2-column (`body`, `headers`) DataFrame to `Dataset[Event]`. */
  def asEvents(df: DataFrame): Dataset[Event] = df.as[Event]

  /** DevZero synthetic generator (reference
    * `core/src/main/scala/atiesh/source/DevZero.scala:38-41`: emits
    * `batch-size` events `"0"` per cycle). Streaming form: the rate source
    * with `rowsPerSecond = batch-size` (one "cycle" per second). */
  def devZero(spark: SparkSession, batchSize: Int = 1024): Dataset[Event] =
    asEvents(spark.readStream.format("rate")
      .option("rowsPerSecond", batchSize.toLong)
      .load()
      .select(lit("0").as("body"),
              map(lit("seq"), col("value").cast("string")).as("headers")))

  /** Batch twin of devZero for offline tests/oracle (`n` events "0"). */
  def devZeroBatch(spark: SparkSession, n: Long = 1024L): Dataset[Event] =
    asEvents(spark.range(n)
      .select(lit("0").as("body"),
              map(lit("seq"), col("id").cast("string")).as("headers")))

  /** Directory-watch tailing source (reference
    * `DirectoryWatchSourceSemantics.scala:204-278`): Spark's file stream
    * does the new-file discovery + per-file offsets; the reference's
    * per-cycle line cap becomes `maxFilesPerTrigger`, the max-line-length
    * guard (truncate-or-drop, reference `:224-244`) and the optional
    * filename header (`fn`, reference `:50-53,219-223`) are projections.
    * Offset-within-file (`off`) has no built-in equivalent — file
    * granularity is what Spark's recovery tracks (documented trade). */
  def directoryWatch(spark: SparkSession, dir: String,
                     maxFilesPerTrigger: Int = 16,
                     maxLineLength: Int = 512 * 1024,
                     truncateOverLength: Boolean = true,
                     fileHeaders: Boolean = false,
                     archiveDir: Option[String] = None,
                     charset: String = "UTF-8"): Dataset[Event] = {
    // charset = the reference's `file-charset` option
    // (DirectoryWatchSourceSemantics.scala:40-41,335,372). Spark's text
    // source only decodes UTF-8, so any other charset routes through the
    // binaryFile + LinesWithOffsets path (lenient IGNORE decoding there);
    // in that mode the over-length guard is in BYTES — the same unit the
    // reference configures — rather than the text path's characters.
    if (!charset.equalsIgnoreCase("UTF-8")) {
      graft.functions.LineOffsetUtil.checkCharset(charset) // fail fast
      val lines = binaryLines(spark, dir, maxFilesPerTrigger,
        if (truncateOverLength) maxLineLength else 0, charset, archiveDir)
      // drop mode bounds bytes in the file's OWN encoding (l.raw_len) —
      // the decoded string's UTF-8 re-encoding can be longer than the
      // original bytes, so octet_length would over-drop
      val guarded =
        if (truncateOverLength) lines
        else lines.where(col("l.raw_len") <= maxLineLength)
      val projected =
        if (fileHeaders)
          guarded.select(col("l.line").as("body"),
            map(lit(Event.Headers.FileName), col("path")).as("headers"))
        else guarded.select(col("l.line").as("body"),
          map().cast("map<string,string>").as("headers"))
      return asEvents(projected)
    }
    // archiveDir = the reference's doneFile hook (consumed files moved
    // aside, DirectoryWatchSourceSemantics.scala:297-319) via the file
    // source's native cleanSource/sourceArchiveDir options
    val reader = spark.readStream.format("text")
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toLong)
    archiveDir.foreach { d =>
      reader.option("cleanSource", "archive").option("sourceArchiveDir", d)
    }
    val raw = reader.load(dir)
    // drop-mode bounds BYTES (the config's unit); truncate-mode counts
    // CHARACTERS (the text source has already decoded — a byte-exact cut
    // needs the binaryFile variant, `directoryWatchWithOffsets`)
    val guarded =
      if (truncateOverLength) raw.select(substring(col("value"), 1, maxLineLength).as("body"))
      else raw.where(octet_length(col("value")) <= maxLineLength).select(col("value").as("body"))
    val withHeaders =
      if (fileHeaders)
        guarded.select(col("body"),
          map(lit(Event.Headers.FileName), input_file_name()).as("headers"))
      else guarded.select(col("body"), map().cast("map<string,string>").as("headers"))
    asEvents(withHeaders)
  }

  /** Directory-watch variant with the reference's per-line `off` header
    * (byte offset of each line within its file,
    * `DirectoryWatchSourceSemantics.scala:50-53,219-223`). Reads whole
    * files via the binaryFile source and splits lines with a native
    * one-pass expression ([[graft.functions.LinesWithOffsets]]) — the
    * line-oriented text source cannot reconstruct byte offsets. Costs one
    * whole-file buffer per task versus the plain variant, so it is opt-in
    * (`line-offsets = true` in the pipeline config). */
  def directoryWatchWithOffsets(spark: SparkSession, dir: String,
                                maxFilesPerTrigger: Int = 16,
                                maxLineLength: Int = 512 * 1024,
                                truncateOverLength: Boolean = true,
                                charset: String = "UTF-8"): Dataset[Event] = {
    // truncation happens inside the byte-level line split so the bound is in
    // BYTES (same unit as the max-line-length config and the `off` header)
    // and never cuts a UTF-8 character in half — a substring() truncation
    // counts characters, so a multi-byte line could exceed the byte bound
    val maxBytes = if (truncateOverLength) maxLineLength else 0
    val lines = binaryLines(spark, dir, maxFilesPerTrigger, maxBytes,
        charset, archiveDir = None)
      .select(col("l.line").as("body"), col("path"), col("l.off").as("off"),
        col("l.raw_len").as("raw_len"))
    // drop mode bounds bytes in the file's OWN encoding (raw_len), not the
    // decoded string's UTF-8 re-encoding
    val guarded =
      if (truncateOverLength) lines
      else lines.where(col("raw_len") <= maxLineLength)
    asEvents(guarded.select(col("body"),
      map(lit(Event.Headers.FileName), col("path"),
          lit(Event.Headers.FileOffset), col("off").cast("string")).as("headers")))
  }

  /** Shared binaryFile-stream reader + per-line split for the directory
    * variants that need byte-level control (offsets, non-UTF-8 charsets).
    * Returns rows of (path, l = struct(line, off)). */
  private def binaryLines(spark: SparkSession, dir: String,
                          maxFilesPerTrigger: Int, maxBytes: Int,
                          charset: String,
                          archiveDir: Option[String]): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.graftbridge.ColumnBridge.{column, expression}
    // the binaryFile source's fixed schema, required explicitly when streaming
    val binSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("path", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("modificationTime", org.apache.spark.sql.types.TimestampType),
      org.apache.spark.sql.types.StructField("length", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("content", org.apache.spark.sql.types.BinaryType)))
    val reader = spark.readStream.format("binaryFile").schema(binSchema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toLong)
    archiveDir.foreach { d =>
      reader.option("cleanSource", "archive").option("sourceArchiveDir", d)
    }
    reader.load(dir).select(col("path"),
      explode(column(graft.functions.LinesWithOffsets(
        expression(col("content")), maxBytes, charset))).as("l"))
  }

  /** Batch twin of the directory source (Trigger.AvailableNow-style tests
    * and the oracle gate read the same projection as a plain scan). */
  def directoryBatch(spark: SparkSession, dir: String,
                     maxLineLength: Int = 512 * 1024,
                     truncateOverLength: Boolean = true): Dataset[Event] = {
    val raw = spark.read.format("text").load(dir)
    val guarded =
      if (truncateOverLength) raw.select(substring(col("value"), 1, maxLineLength).as("body"))
      else raw.where(octet_length(col("value")) <= maxLineLength).select(col("value").as("body"))
    asEvents(guarded.select(col("body"), map().cast("map<string,string>").as("headers")))
  }

  /** Kafka consumer source option mapping (reference
    * `KafkaSourceSenmantics.scala` — poll loop, commit cadence, rebalance
    * listener, seek flags are all replaced by Spark's checkpointed offsets).
    * Returns (format, options) for `spark.readStream.format(fmt).options(o)`;
    * execution requires the spark-sql-kafka connector on the cluster
    * classpath (not present in this offline environment — option mapping is
    * unit-tested, execution is integration-gated). */
  def kafkaSourceOptions(cfg: GraftConfig): (String, Map[String, String]) = {
    val topics = cfg.getStringList("topics")
    require(topics.nonEmpty, "kafka source needs <topics>")
    val seekBeginning = cfg.getBoolean("seek-to-beginning", default = false)
    val seekEnd = cfg.getBoolean("seek-to-end", default = false)
    require(!(seekBeginning && seekEnd),
      "cannot set both <seek-to-beginning> and <seek-to-end>") // reference KafkaSourceSenmantics.scala:245-251
    val starting = if (seekBeginning) "earliest" else "latest"
    ("kafka", Map(
      "kafka.bootstrap.servers" -> cfg.getString("bootstrap-servers"),
      "subscribe" -> topics.mkString(","),
      "startingOffsets" -> cfg.getString("starting-offsets", starting),
      // reference poll batching → trigger rate limit (backpressure parity)
      "maxOffsetsPerTrigger" -> cfg.getLong("max-offsets-per-trigger", 10000L).toString,
      "failOnDataLoss" -> cfg.getString("fail-on-data-loss", "false")))
  }

  /** Kafka record → Event projection (reference wraps record value with
    * topic/partition headers and skips null values,
    * `KafkaSourceSenmantics.scala:147-156`). Input: the kafka connector's
    * fixed output schema (key, value, topic, partition, offset, ...). */
  def kafkaRecordsAsEvents(df: DataFrame): Dataset[Event] =
    asEvents(df
      .where(col("value").isNotNull) // skip null values, reference :148-156
      .select(col("value").cast("string").as("body"),
        map(lit(Event.Headers.KafkaTopic), col("topic"),
            lit(Event.Headers.KafkaPartition), col("partition").cast("string"))
          .as("headers")))

  /** The driver corpus `events` table reinterpreted as the event stream
    * fixture (FIXTURES.md §4): body = props JSON, typed fields become
    * headers. Used by the oracle gate and the e2e pipeline tests. */
  def eventsTableAsEvents(df: DataFrame): Dataset[Event] =
    asEvents(df.select(col("props").as("body"),
      map(lit("event_type"), col("event_type"),
          lit("user_id"), col("user_id").cast("string"),
          lit("event_id"), col("event_id").cast("string")).as("headers")))

  /** Streaming read of a parquet table (file-source). The streaming file
    * source only accepts directories; a single-file path is streamed from
    * its parent directory with a glob filter pinned to that file. */
  def parquetStream(spark: SparkSession, path: String,
                    maxFilesPerTrigger: Int = 4): DataFrame = {
    val schema = spark.read.parquet(path).schema
    val f = new java.io.File(path)
    val reader = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger.toLong)
    if (f.isFile)
      reader.option("pathGlobFilter", f.getName).parquet(f.getParent)
    else reader.parquet(path)
  }
}
