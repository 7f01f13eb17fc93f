package graft

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.streaming.Trigger

class HttpPushSpec extends SparkSpec {

  test("http-push DSv2 source: events flow, 201 arrives only after commit") {
    val port = { // pick a free port deterministically
      val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close()
    }
    val work = java.nio.file.Files.createTempDirectory("graft-httppush")
    val stream = spark.readStream.format("http-push")
      .option("port", port.toString)
      .option("request-header-capture-prefix", "x-graft-")
      .load()
    val query = stream.writeStream
      .format("memory").queryName("httppush_out")
      .option("checkpointLocation", work.resolve("ck").toString)
      .trigger(Trigger.ProcessingTime(100))
      .start()
    try {
      // server is up once the first micro-batch planning has run; poke until open
      val client = HttpClient.newHttpClient()
      def post(body: String) = client.sendAsync(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
          .header("x-graft-tenant", "acme")
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.discarding())

      var up = false
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
      while (!up && System.nanoTime() < deadline) {
        try {
          val f = post("e1\ne2\ne3")
          // response must NOT resolve before the batch commits; wait for it
          val resp = f.get(30, TimeUnit.SECONDS)
          assert(resp.statusCode() == 201)
          up = true
        } catch {
          case e: java.util.concurrent.ExecutionException
              if e.getCause.isInstanceOf[java.net.ConnectException] =>
            Thread.sleep(200) // server not started yet
        }
      }
      assert(up, "http-push endpoint never came up")
      query.processAllAvailable()
      val rows = spark.sql("select * from httppush_out").collect()
      assert(rows.map(_.getString(0)).toSet == Set("e1", "e2", "e3"))
      // captured prefix header present on every event
      assert(rows.forall(_.getMap[String, String](1).get("x-graft-tenant")
        .contains("acme")))
    } finally {
      query.stop()
      graft.sources.http.HttpPushRegistry.remove(port)
    }
  }

  test("restart safety: foreign-epoch offsets replay empty and never ack live events") {
    import graft.sources.http.{HttpPushOffset, HttpPushRegistry}
    val ep = HttpPushRegistry.getOrCreate(0, '\n', 4, None)
    try {
      val port = ep.boundPort
      val client = HttpClient.newHttpClient()
      val pending = client.sendAsync(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
          .POST(HttpRequest.BodyPublishers.ofString("a\nb")).build(),
        HttpResponse.BodyHandlers.discarding())
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
      while (ep.latest < 2 && System.nanoTime() < deadline) Thread.sleep(20)
      assert(ep.latest == 2, "events must land in the log")
      // a checkpoint from a PREVIOUS endpoint life (epoch unknown to ep):
      val oldStart = HttpPushOffset("deadbeef", 80L)
      val oldEnd = HttpPushOffset("deadbeef", 100L)
      // the replayed batch translates to the empty range at base — no
      // IndexOutOfBounds crash on the compacted/unknown offsets
      assert(ep.translate(oldStart) == ep.base && ep.translate(oldEnd) == ep.base)
      assert(ep.slice(ep.translate(oldStart), ep.translate(oldEnd)).isEmpty)
      // a stale checkpointed COMMIT (offset 100 from the old life) must not
      // ack the two live events it never covered
      ep.commitUpTo(ep.translate(oldEnd))
      assert(!pending.isDone, "stale commit falsely acked live events")
      assert(ep.latest == 2, "stale commit must not compact live events")
      // the current-epoch commit acks them properly
      ep.commitUpTo(ep.latest)
      assert(pending.get(10, TimeUnit.SECONDS).statusCode() == 201)
    } finally HttpPushRegistry.remove(ep.boundPort)
  }

  test("two port-0 sources bind distinct endpoints (no shared log)") {
    import graft.sources.http.HttpPushRegistry
    val a = HttpPushRegistry.getOrCreate(0, '\n', 4, None)
    val b = HttpPushRegistry.getOrCreate(0, '\n', 4, None)
    try {
      assert(a ne b, "port-0 endpoints must never share a log")
      assert(a.boundPort != b.boundPort)
      assert(a.epoch != b.epoch)
    } finally {
      HttpPushRegistry.remove(a.boundPort)
      HttpPushRegistry.remove(b.boundPort)
    }
  }

  test("admission window counts UNACKED requests; permits release when acks drain") {
    import graft.sources.http.HttpPushRegistry
    // endpoint driven directly (no streaming query): acks only move when
    // commitUpTo is called, so the unacked window is fully controllable
    val ep = HttpPushRegistry.getOrCreate(0, '\n', maxConnections = 2, None)
    try {
      val port = ep.boundPort
      val client = HttpClient.newHttpClient()
      def post(body: String) = client.sendAsync(
        HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
          .POST(HttpRequest.BodyPublishers.ofString(body)).build(),
        HttpResponse.BodyHandlers.discarding())
      def await(cond: => Boolean, what: String): Unit = {
        val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(20)
        while (!cond && System.nanoTime() < deadline) Thread.sleep(50)
        assert(cond, what)
      }
      val f1 = post("a")
      val f2 = post("b")
      await(ep.latest == 2, "first two requests not registered")
      assert(!f1.isDone && !f2.isDone, "201 must not arrive before commit")
      // the permit is held until the deferred ack, not just while parsing:
      // a third request must shed even though no handler is running
      val f3 = post("c")
      assert(f3.get(10, TimeUnit.SECONDS).statusCode() == 503)
      // commit → both acks drain, permits free
      ep.commitUpTo(ep.latest)
      assert(f1.get(10, TimeUnit.SECONDS).statusCode() == 201)
      assert(f2.get(10, TimeUnit.SECONDS).statusCode() == 201)
      // window is open again: a new request is admitted (deferred, not 503)
      val f4 = post("d")
      await(ep.latest == 3, "post-drain request not admitted")
      ep.commitUpTo(ep.latest)
      assert(f4.get(10, TimeUnit.SECONDS).statusCode() == 201)
    } finally HttpPushRegistry.remove(ep.boundPort)
  }

  test("gzip body accepted; corrupt gzip rejected with 400") {
    val port = { val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close() }
    val work = java.nio.file.Files.createTempDirectory("graft-httppush2")
    val query = spark.readStream.format("http-push")
      .option("port", port.toString).load()
      .writeStream.format("memory").queryName("httppush_gz")
      .option("checkpointLocation", work.resolve("ck").toString)
      .trigger(Trigger.ProcessingTime(100)).start()
    try {
      val client = HttpClient.newHttpClient()
      def send(body: Array[Byte], gzip: Boolean) = {
        val b = HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
          .POST(HttpRequest.BodyPublishers.ofByteArray(body))
        if (gzip) b.header("Content-Encoding", "gzip")
        client.sendAsync(b.build(), HttpResponse.BodyHandlers.discarding())
      }
      // wait for server
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(30)
      var ok = false
      while (!ok && System.nanoTime() < deadline) {
        try {
          val f = send(graft.functions.Compressor.gzipCompress("g1\ng2".getBytes), gzip = true)
          assert(f.get(30, TimeUnit.SECONDS).statusCode() == 201)
          ok = true
        } catch {
          case e: java.util.concurrent.ExecutionException
              if e.getCause.isInstanceOf[java.net.ConnectException] =>
            Thread.sleep(200)
        }
      }
      assert(ok)
      // corrupt gzip → immediate 400 (no commit involved)
      val bad = send("not gzip at all".getBytes, gzip = true).get(10, TimeUnit.SECONDS)
      assert(bad.statusCode() == 400)
      query.processAllAvailable()
      val rows = spark.sql("select body from httppush_gz").collect().map(_.getString(0)).toSet
      assert(rows == Set("g1", "g2"))
    } finally {
      query.stop()
      graft.sources.http.HttpPushRegistry.remove(port)
    }
  }

  test("registry start/stop cycles free server threads and sockets") {
    import graft.sources.http.HttpPushRegistry
    import scala.jdk.CollectionConverters._
    // the e2e gate row starts and stops an endpoint every bench pass — a
    // lingering worker thread or bound socket per cycle would feed exactly
    // the session-age accumulation the bench hunts (round-3 verdict item 6)
    def pushThreads: Int = Thread.getAllStackTraces.keySet.asScala
      .count(t => t.isAlive && t.getName.startsWith("http-push-"))
    def awaitDrained(baseline: Int): Unit = {
      val deadline = System.nanoTime() + TimeUnit.SECONDS.toNanos(10)
      while (pushThreads > baseline && System.nanoTime() < deadline)
        Thread.sleep(50)
    }
    awaitDrained(0) // earlier suites' endpoints may still be winding down
    val before = pushThreads
    var lastPort = -1
    (1 to 10).foreach { _ =>
      val ep = HttpPushRegistry.getOrCreate(0, '\n', 4, None)
      lastPort = ep.boundPort
      // live: a TCP connect must succeed while the endpoint is up
      val s = new java.net.Socket("127.0.0.1", lastPort)
      s.close()
      HttpPushRegistry.remove(ep.boundPort)
    }
    assert(HttpPushRegistry.lookup(lastPort).isEmpty, "registry entry must be gone")
    // socket released: connecting to the last endpoint's port now fails
    intercept[java.io.IOException] {
      val s = new java.net.Socket("127.0.0.1", lastPort); s.close()
    }
    awaitDrained(before)
    val after = pushThreads
    assert(after <= before,
      s"worker threads leaked across cycles: $before before, $after after")
  }
}
