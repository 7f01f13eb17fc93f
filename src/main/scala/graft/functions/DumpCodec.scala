package graft.functions

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64

import graft.event.Event

/** Durable spill codec for undelivered events — format parity with the
  * reference's shutdown dump / boot recovery
  * (`semantics-http/src/main/scala/atiesh/sink/HttpLimitRequestSinkSemantics.scala:314-371`):
  *
  *   one line per event,
  *   with headers:    base64(body);base64(key),base64(value);base64(key),...
  *   without headers: base64(body)
  *
  * In the Spark engine crash recovery is normally the checkpoint + replayable
  * source (SURVEY.md §2.3); this codec exists for the sink connectors'
  * side-output spill path (events a non-replayable sink could not deliver are
  * written as a retry Dataset and re-consumed as a stream) and for migration
  * compatibility with dumps produced by the reference.
  */
object DumpCodec {
  def encode(event: Event): String = {
    val enc = Base64.getEncoder
    val sb = new StringBuilder(enc.encodeToString(event.body.getBytes(UTF_8)))
    event.headers.foreach { case (k, v) =>
      sb.append(';').append(enc.encodeToString(k.getBytes(UTF_8)))
        .append(',').append(enc.encodeToString(v.getBytes(UTF_8)))
    }
    sb.toString
  }

  def decode(line: String): Event = {
    val dec = Base64.getDecoder
    val parts = line.split(';')
    val body = new String(dec.decode(parts.head), UTF_8)
    val headers = parts.tail.foldLeft(Map.empty[String, String]) { (hs, p) =>
      // split with limit -1: an empty header value encodes as "key," and a
      // plain split(',') would drop the trailing empty field (the reference
      // decoder crashes on this input — deliberate robustness divergence)
      val Array(k, v) = p.split(",", -1)
      hs + (new String(dec.decode(k), UTF_8) -> new String(dec.decode(v), UTF_8))
    }
    Event(body, headers)
  }
}

/** Retry backoff schedule — formula parity with the reference
  * (`HttpLimitRequestSinkSemantics.scala:123-131`):
  * `min(2^attempt * 1000 + jitter, capMillis)` milliseconds, where jitter is
  * uniform in [0, 1000). The attempt exponent is capped (reference
  * `maxBackoff`) so `2^n` cannot overflow on infinite-retry sinks.
  */
object Backoff {
  val DefaultCapMillis  = 32000L // reference request-retry-backoff default
  val DefaultMaxExponent = 16.0  // reference request-retry-max-backoff-exponent

  def delayMillis(attempt: Double, jitterMillis: Long = 0L,
                  capMillis: Long = DefaultCapMillis): Long =
    math.min(math.pow(2.0, math.min(attempt, DefaultMaxExponent)) * 1000 +
             jitterMillis, capMillis.toDouble).toLong

  def randomDelayMillis(attempt: Double, capMillis: Long = DefaultCapMillis): Long =
    delayMillis(attempt, scala.util.Random.nextInt(1000).toLong, capMillis)
}
