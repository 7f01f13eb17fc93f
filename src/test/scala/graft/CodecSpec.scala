package graft

import graft.event.Event
import graft.functions.{Backoff, Compressor, DumpCodec}
import org.scalatest.funsuite.AnyFunSuite

class CodecSpec extends AnyFunSuite {
  private val rnd = new scala.util.Random(42)

  test("gzip roundtrip on arbitrary bytes") {
    (0 until 50).foreach { _ =>
      val bytes = Array.fill(rnd.nextInt(4096))(rnd.nextInt().toByte)
      assert(Compressor.gzipDecompress(Compressor.gzipCompress(bytes)).sameElements(bytes))
    }
  }

  test("dump codec roundtrip survives delimiters, newlines, unicode") {
    val tricky = Vector("", ";", ",", "a;b,c", "line\nbreak", "ünïcödé 中文", "plain")
    def pick() = tricky(rnd.nextInt(tricky.size))
    (0 until 200).foreach { _ =>
      val headers = (0 until rnd.nextInt(4))
        .map(i => s"k$i${pick()}" -> pick()).toMap
      val e = Event(pick(), headers)
      assert(DumpCodec.decode(DumpCodec.encode(e)) == e)
    }
  }

  test("dump format matches the reference layout") {
    // base64(body);base64(key),base64(value) — reference
    // HttpLimitRequestSinkSemantics.scala:314-371
    val line = DumpCodec.encode(Event("ab", Map("k" -> "v")))
    assert(line == "YWI=;aw==,dg==")
    assert(DumpCodec.encode(Event("ab")) == "YWI=")
  }

  test("backoff formula: min(2^n*1000 + jitter, cap), exponent capped") {
    assert(Backoff.delayMillis(0) == 1000L)
    assert(Backoff.delayMillis(3) == 8000L)
    assert(Backoff.delayMillis(5) == 32000L)  // hits default cap
    assert(Backoff.delayMillis(60) == 32000L) // exponent capped, no overflow
    assert(Backoff.delayMillis(2, jitterMillis = 500) == 4500L)
    assert(Backoff.delayMillis(1, capMillis = 1500) == 1500L)
  }
}
