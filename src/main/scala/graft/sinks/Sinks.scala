package graft.sinks

import graft.config.GraftConfig
import graft.event.Event
import graft.functions.{Backoff, DumpCodec}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sink-side operators (SURVEY.md §2.3): routing, delivery connectors, and
  * the reliability semantics the reference implements by hand (ack windows,
  * retry backoff, disk dump) re-expressed on Spark's micro-batch epoch
  * model. The epoch commit *is* the reference's transaction ack: a batch's
  * offsets are committed to the checkpoint only after every sink write of
  * that batch returned — which is exactly the per-source barrier of
  * `KafkaSynchronousAckSinkSemantics` (reference `:151-173`) for free.
  */
object Sinks {

  // ---- routing ----------------------------------------------------------

  /** A named sink route: `accept` is the sink's acceptance predicate over
    * the Event schema (reference `Sink.accept(event)`, `Sink.scala:223`). */
  final case class Route(name: String, accept: Column)

  /** First-match routing (reference `Source.scala:339-365`): an event goes
    * to the first route whose predicate accepts it; events no route accepts
    * are discarded (reference logs + drops). With a single route the
    * predicate is bypassed entirely (`skip-accept-check-on-single`,
    * reference `:339-349`) — Catalyst constant-folds the `lit(true)`.
    * Returns the batch with a `__sink` column; null = discard. */
  def assign(batch: DataFrame, routes: Seq[Route],
             skipAcceptCheckOnSingle: Boolean = true): DataFrame = {
    val sinkCol =
      if (routes.sizeIs == 1 && skipAcceptCheckOnSingle) lit(routes.head.name)
      else routes.foldRight(lit(null).cast("string")) { (r, rest) =>
        when(r.accept, lit(r.name)).otherwise(rest)
      }
    batch.withColumn("__sink", sinkCol)
  }

  /** Mutually-exclusive fan-out of one micro-batch to its routed sinks —
    * the `foreachBatch` body for multi-sink pipelines. The batch is
    * persisted once so N sink filters don't recompute the source scan. */
  def fanout(batch: DataFrame, routes: Seq[Route],
             writers: Map[String, DataFrame => Unit],
             skipAcceptCheckOnSingle: Boolean = true): Unit = {
    val assigned = assign(batch, routes, skipAcceptCheckOnSingle)
    val multi = routes.sizeIs > 1
    if (multi) assigned.persist()
    try routes.foreach { r =>
      writers.get(r.name).foreach { w =>
        w(assigned.where(col("__sink") === r.name).drop("__sink"))
      }
    } finally if (multi) { assigned.unpersist(); () }
  }

  // ---- kafka ------------------------------------------------------------

  /** Kafka producer projection (reference `KafkaSinkSemantics.kafkaSend`
    * `:109-150` + per-event topic-header routing `KafkaLimitAckSink.scala:48-50`
    * + random-UUID keys `KafkaSink.scala:18-21`): a per-row `topic` column
    * replaces the topic-header indirection, `uuid()` replaces the
    * MetadataParser default key. Write with
    * `.writeStream.format("kafka")` on a cluster with the kafka connector;
    * ack-window backpressure (`max-pending-acks`, reference `:202-218`) is
    * subsumed by producer configs + the micro-batch barrier. */
  def kafkaRecords(events: DataFrame, staticTopic: Option[String],
                   topicHeader: Option[String] = None): DataFrame = {
    val topicCol = (topicHeader, staticTopic) match {
      case (Some(h), Some(t)) => coalesce(element_at(col("headers"), h), lit(t))
      case (Some(h), None)    => element_at(col("headers"), h)
      case (None, Some(t))    => lit(t)
      case _ => throw new IllegalArgumentException("kafka sink needs a topic")
    }
    events.select(uuid().as("key"), col("body").as("value"), topicCol.as("topic"))
  }

  def kafkaSinkOptions(cfg: GraftConfig): Map[String, String] = Map(
    "kafka.bootstrap.servers" -> cfg.getString("bootstrap-servers"),
    // reference must-send infinite retry → producer-level retries
    "kafka.retries" -> cfg.getString("retries", Int.MaxValue.toString),
    "kafka.max.in.flight.requests.per.connection" ->
      cfg.getString("max-in-flight", "5"))

  // ---- file / noop ------------------------------------------------------

  def fileWriter(path: String, format: String = "parquet"): DataFrame => Unit =
    batch => batch.write.mode("append").format(format).save(path)

  def noopWriter: DataFrame => Unit =
    batch => { batch.write.format("noop").mode("overwrite").save(); () }

  // ---- HTTP -------------------------------------------------------------

  /** HTTP delivery policy — parity with the reference's response handling
    * (`HttpSink.scala:270-310`): 2xx done, 4xx drop, 5xx retry, transport
    * error retry; retry delay `min(2^n*1000+jitter, cap)`
    * (`HttpLimitRequestSinkSemantics.scala:123-131`). */
  final case class HttpSinkConfig(
      url: String,
      method: String = "POST",
      contentType: String = "text/plain",
      basicAuth: Option[(String, String)] = None, // reference HttpSink.scala:86-93
      gzipBody: Boolean = false,
      batchJoin: String = "\n",     // reference assembleBatchBody HttpSink.scala:151-154
      maxRetries: Int = 3,          // reference HttpSink.scala:37-38
      backoffCapMillis: Long = Backoff.DefaultCapMillis,
      maxConnections: Int = 32,     // reference HttpSinkSemantics.scala:38-39
      requestLimits: Int = 512,     // reference in-flight window :29-30
      dumpDir: Option[String] = None)

  object HttpSinkConfig {
    def fromConfig(c: GraftConfig): HttpSinkConfig = HttpSinkConfig(
      url = c.getString("remote-url"),
      method = c.getString("http-method", "POST"),
      contentType = c.getString("content-type", "text/plain"),
      basicAuth = for {
        u <- c.getStringOpt("auth-username"); p <- c.getStringOpt("auth-password")
      } yield (u, p),
      gzipBody = c.getBoolean("gzip-body", default = false),
      maxRetries = c.getInt("max-retries", 3),
      backoffCapMillis = c.getDuration("request-retry-backoff",
        scala.concurrent.duration.FiniteDuration(32000, "ms")).toMillis,
      maxConnections = c.getInt("max-connections", 32),
      requestLimits = c.getInt("request-limits", 512),
      dumpDir = c.getStringOpt("event-dump-path"))
  }

  /** HTTP sink connector: runs inside `foreachPartition` on executors with a
    * bounded-concurrency JDK HttpClient per partition (the reference's
    * akka host-connection-pool + request queue, `HttpSinkSemantics.scala:130-190`,
    * becomes a semaphore-bounded async client). Undeliverable events after
    * `maxRetries` are spilled with `DumpCodec` to `dumpDir` (reference dump,
    * `HttpLimitRequestSinkSemantics.scala:314-349`) for re-ingestion as a
    * retry stream — or dropped when no dumpDir, matching 4xx policy. */
  final class HttpConnector(cfg: HttpSinkConfig) extends Serializable {
    @transient private lazy val client: java.net.http.HttpClient =
      java.net.http.HttpClient.newBuilder()
        .connectTimeout(java.time.Duration.ofSeconds(10))
        .build()

    /** Response policy: Right(()) done; Left(true) retry; Left(false) drop. */
    def classify(status: Int): Either[Boolean, Unit] =
      if (status >= 200 && status < 300) Right(())
      else if (status >= 400 && status < 500) Left(false) // drop, reference policy
      else Left(true)                                     // 5xx → retry

    def sendBody(body: Array[Byte]): Int = {
      // GET carries the payload as query parameter `record` (reference
      // HttpSink.scala:150-171); other methods send it as the request body
      val req =
        if (cfg.method.equalsIgnoreCase("GET")) {
          val rec = java.net.URLEncoder.encode(
            new String(body, java.nio.charset.StandardCharsets.UTF_8), "UTF-8")
          val sep = if (cfg.url.contains("?")) "&" else "?"
          java.net.http.HttpRequest.newBuilder(
            java.net.URI.create(s"${cfg.url}${sep}record=$rec")).GET()
        } else {
          val b = if (cfg.gzipBody) graft.functions.Compressor.gzipCompress(body) else body
          val r = java.net.http.HttpRequest.newBuilder(java.net.URI.create(cfg.url))
            .header("Content-Type", cfg.contentType)
            .method(cfg.method,
              java.net.http.HttpRequest.BodyPublishers.ofByteArray(b))
          if (cfg.gzipBody) r.header("Content-Encoding", "gzip")
          r
        }
      cfg.basicAuth.foreach { case (u, p) =>
        req.header("Authorization", "Basic " + java.util.Base64.getEncoder
          .encodeToString(s"$u:$p".getBytes(java.nio.charset.StandardCharsets.UTF_8)))
      }
      client.send(req.build(),
        java.net.http.HttpResponse.BodyHandlers.discarding()).statusCode()
    }

    /** Deliver one assembled batch body with the retry/backoff policy.
      * Returns true when delivered, false when dropped/spilled. */
    def deliver(body: Array[Byte], sleeper: Long => Unit = Thread.sleep): Boolean = {
      var attempt = 0
      while (attempt <= cfg.maxRetries) {
        val outcome =
          try classify(sendBody(body))
          catch { case _: java.io.IOException => Left(true) } // transport error → retry
        outcome match {
          case Right(())   => return true
          case Left(false) => return false
          case Left(true)  =>
            if (attempt < cfg.maxRetries)
              sleeper(Backoff.randomDelayMillis(attempt.toDouble, cfg.backoffCapMillis))
            attempt += 1
        }
      }
      false
    }
  }

  /** The `foreachBatch` writer: per partition, events are grouped into
    * bodies of `batchSize` joined with `batchJoin` (reference batch
    * assembly) and delivered with bounded concurrency. Failed deliveries
    * are spilled via `DumpCodec` when configured. */
  def httpWriter(cfg: HttpSinkConfig, batchSize: Int = 128): DataFrame => Unit = {
    batch =>
      val connector = new HttpConnector(cfg)
      val join = cfg.batchJoin
      val dumpDir = cfg.dumpDir
      batch.select(col("body"), col("headers")).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          val spill = new scala.collection.mutable.ArrayBuffer[Event]()
          rows.grouped(batchSize).foreach { group =>
            val events = group.map(r => Event(r.getString(0),
              Option(r.getMap[String, String](1)).map(_.toMap).getOrElse(Map.empty)))
            val body = events.map(_.body).mkString(join)
              .getBytes(java.nio.charset.StandardCharsets.UTF_8)
            if (!connector.deliver(body)) spill ++= events
          }
          dumpDir.foreach { dir =>
            if (spill.nonEmpty) {
              val p = java.nio.file.Paths.get(dir,
                s"dump-${java.util.UUID.randomUUID()}.txt")
              java.nio.file.Files.createDirectories(p.getParent)
              val w = java.nio.file.Files.newBufferedWriter(p)
              try spill.foreach { e => w.write(DumpCodec.encode(e)); w.newLine() }
              finally w.close()
            }
          }
      }
  }

  /** Recover a dump directory (reference boot recovery,
    * `HttpLimitRequestSinkSemantics.scala:358-371`) as a Dataset of events
    * ready to re-enter a pipeline. */
  def recoverDump(spark: org.apache.spark.sql.SparkSession, dir: String)
      : org.apache.spark.sql.Dataset[Event] = {
    import org.apache.spark.sql.Encoders
    implicit val enc = Encoders.product[Event]
    spark.read.textFile(dir).map(DumpCodec.decode)
  }

  // ---- syslog -----------------------------------------------------------

  /** RFC 3164 / RFC 5424 syslog message formatting (reference
    * `semantics-syslog` delegates to a client lib; the wire formats are
    * public specs, implemented directly — no dependency). */
  object Syslog {
    /** PRI = facility * 8 + severity. */
    def pri(facility: Int, severity: Int): Int = facility * 8 + severity

    def rfc3164(facility: Int, severity: Int, ts: java.time.Instant,
                host: String, app: String, msg: String): String = {
      val fmt = java.time.format.DateTimeFormatter
        .ofPattern("MMM ppd HH:mm:ss", java.util.Locale.US)
        .withZone(java.time.ZoneOffset.UTC)
      s"<${pri(facility, severity)}>${fmt.format(ts)} $host $app: $msg"
    }

    def rfc5424(facility: Int, severity: Int, ts: java.time.Instant,
                host: String, app: String, msgId: String, msg: String): String =
      s"<${pri(facility, severity)}>1 $ts $host $app - $msgId - $msg"

    /** RFC 6587 octet-counting framing for TCP transport. */
    def octetFramed(message: String): String = s"${message.length} $message"
  }

  /** Syslog sink writer: per-partition socket (TCP or UDP) delivery of each
    * event body as one syslog message. */
  def syslogWriter(host: String, port: Int, facility: Int = 1, severity: Int = 6,
                   app: String = "graft", useTcp: Boolean = true): DataFrame => Unit = {
    batch =>
      batch.select(col("body")).foreachPartition {
        (rows: Iterator[org.apache.spark.sql.Row]) =>
          if (useTcp) {
            val sock = new java.net.Socket(host, port)
            val out = new java.io.OutputStreamWriter(sock.getOutputStream,
              java.nio.charset.StandardCharsets.UTF_8)
            try rows.foreach { r =>
              val m = Syslog.rfc5424(facility, severity, java.time.Instant.now(),
                java.net.InetAddress.getLocalHost.getHostName, app, "-", r.getString(0))
              out.write(Syslog.octetFramed(m))
            } finally { out.flush(); sock.close() }
          } else {
            val sock = new java.net.DatagramSocket()
            try rows.foreach { r =>
              val m = Syslog.rfc3164(facility, severity, java.time.Instant.now(),
                java.net.InetAddress.getLocalHost.getHostName, app, r.getString(0))
                .getBytes(java.nio.charset.StandardCharsets.UTF_8)
              sock.send(new java.net.DatagramPacket(m, m.length,
                java.net.InetAddress.getByName(host), port))
            } finally sock.close()
          }
      }
  }
}
