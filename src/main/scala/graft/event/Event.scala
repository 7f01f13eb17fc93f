package graft.event

import org.apache.spark.sql.types.{MapType, StringType, StructField, StructType}

/** The universal record of the engine: an opaque string body plus a string
  * map of source-defined metadata.
  *
  * Mirrors the reference data model (`atiesh.event.Event`,
  * reference `core/src/main/scala/atiesh/event/Event.scala:10-20`): the
  * reference's `payload: String` is `body` here, headers are identical.
  * The reference's `Empty` tombstone (`Event.scala:25-35`) is represented
  * as `Option[Event] = None` at the interceptor boundary — Spark's
  * `flatMap`/`filter` subsumes the discard marker, no sentinel object is
  * needed.
  *
  * As a case class it gets a Catalyst product `Encoder` for free, so a
  * stream of events is a `Dataset[Event]` with columnar (Tungsten) layout
  * `STRUCT<body STRING, headers MAP<STRING,STRING>>`.
  */
final case class Event(body: String, headers: Map[String, String] = Map.empty) {
  /** Reference `SimpleEvent.setHeaders(pairs*)` parity
    * (`core/src/main/scala/atiesh/event/SimpleEvent.scala:23-26`). */
  def withHeaders(pairs: (String, String)*): Event =
    copy(headers = pairs.foldLeft(headers) { case (hs, (k, v)) => hs + (k -> v) })

  def withBody(b: String): Event = copy(body = b)

  def header(key: String): Option[String] = headers.get(key)
}

object Event {
  /** Schema of `Dataset[Event].toDF` — the engine's on-the-wire row shape. */
  val schema: StructType = StructType(Seq(
    StructField("body", StringType, nullable = true),
    StructField("headers", MapType(StringType, StringType), nullable = true)))

  /** Well-known header keys (the only implicit "schema" the reference has —
    * see SURVEY.md §1.1). */
  object Headers {
    val KafkaTopic     = "kafkaTopic"     // reference KafkaSourceSenmantics.scala:32-35
    val KafkaPartition = "kafkaPartition"
    val FileName       = "fn"             // reference DirectoryWatchSourceSemantics.scala:50-53
    val FileOffset     = "off"
  }
}
