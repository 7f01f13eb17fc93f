package graft

import graft.event.Event
import graft.functions.DumpCodec
import graft.sinks.Sinks
import graft.sinks.Sinks.{HttpConnector, HttpSinkConfig, Route}

import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}
import java.net.InetSocketAddress
import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger
import org.apache.spark.sql.functions._

class SinksSpec extends SparkSpec {

  // ---- routing ----------------------------------------------------------

  test("first-match routing; null for no acceptor; single-route bypass") {
    val df = spark.createDataFrame(Seq(
      ("apple", Map.empty[String, String]),
      ("banana", Map.empty[String, String]),
      ("zz", Map.empty[String, String]))).toDF("body", "headers")
    val routes = Seq(
      Route("a", col("body").startsWith("a")),
      Route("b", col("body").startsWith("b")))
    val assigned = Sinks.assign(df, routes, skipAcceptCheckOnSingle = false)
      .collect().map(r => r.getString(0) -> Option(r.getAs[String]("__sink"))).toMap
    assert(assigned == Map("apple" -> Some("a"), "banana" -> Some("b"), "zz" -> None))

    // single sink with bypass: everything goes there, predicate never applies
    val bypass = Sinks.assign(df, Seq(Route("only", lit(false))))
      .collect().map(_.getAs[String]("__sink")).toSet
    assert(bypass == Set("only"))
  }

  // ---- HTTP sink --------------------------------------------------------

  private def withServer(handler: (Int, HttpExchange) => Int)(f: Int => Unit): Unit = {
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    val calls = new AtomicInteger(0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val status = handler(calls.incrementAndGet(), ex)
        ex.sendResponseHeaders(status, -1)
        ex.close()
      }
    })
    server.start()
    try f(server.getAddress.getPort)
    finally server.stop(0)
  }

  test("http connector delivers and reports 2xx") {
    withServer((_, _) => 201) { port =>
      val c = new HttpConnector(HttpSinkConfig(url = s"http://127.0.0.1:$port/"))
      assert(c.deliver("hello".getBytes, _ => ()))
    }
  }

  test("http connector retries 5xx then succeeds; 4xx drops without retry") {
    withServer((n, _) => if (n < 3) 503 else 200) { port =>
      val c = new HttpConnector(HttpSinkConfig(url = s"http://127.0.0.1:$port/"))
      var slept = Vector.empty[Long]
      assert(c.deliver("x".getBytes, d => slept :+= d))
      assert(slept.size == 2) // two backoffs before the 200
      assert(slept.forall(d => d >= 1000 && d <= 32000))
    }
    val count = new AtomicInteger(0)
    withServer((_, _) => { count.incrementAndGet(); 404 }) { port =>
      val c = new HttpConnector(HttpSinkConfig(url = s"http://127.0.0.1:$port/"))
      assert(!c.deliver("x".getBytes, _ => ()))
      assert(count.get() == 1) // 4xx is a drop, not a retry
    }
  }

  test("http connector gives up after maxRetries on persistent 5xx") {
    val count = new AtomicInteger(0)
    withServer((_, _) => { count.incrementAndGet(); 500 }) { port =>
      val c = new HttpConnector(HttpSinkConfig(
        url = s"http://127.0.0.1:$port/", maxRetries = 2))
      assert(!c.deliver("x".getBytes, _ => ()))
      assert(count.get() == 3) // initial + 2 retries
    }
  }

  test("httpWriter delivers batched bodies; failures spill a recoverable dump") {
    val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    withServer((_, ex) => {
      received.add(new String(ex.getRequestBody.readAllBytes())); 200
    }) { port =>
      val batch = spark.createDataFrame(Seq(
        ("e1", Map("h" -> "1")), ("e2", Map("h" -> "2")))).toDF("body", "headers")
      Sinks.httpWriter(HttpSinkConfig(url = s"http://127.0.0.1:$port/"),
        batchSize = 10)(batch)
      val bodies = received.toArray.map(_.toString).toSet
      assert(bodies.flatMap(_.split("\n")).toSet == Set("e1", "e2"))
    }
    // unreachable endpoint → spill to dump dir, recoverable
    val dump = Files.createTempDirectory("graft-dump").toString
    val batch = spark.createDataFrame(Seq(("ev1", Map("k" -> "v"))))
      .toDF("body", "headers")
    Sinks.httpWriter(HttpSinkConfig(url = "http://127.0.0.1:1/",
      maxRetries = 0, dumpDir = Some(dump)), batchSize = 10)(batch)
    val recovered = Sinks.recoverDump(spark, dump).collect().toSet
    assert(recovered == Set(Event("ev1", Map("k" -> "v"))))
  }

  test("http GET mode carries payload as record query param; basic auth header") {
    val seen = new java.util.concurrent.ConcurrentLinkedQueue[(String, String)]()
    withServer((_, ex) => {
      seen.add((ex.getRequestURI.toString,
                Option(ex.getRequestHeaders.getFirst("Authorization")).getOrElse("")))
      200
    }) { port =>
      val c = new HttpConnector(HttpSinkConfig(
        url = s"http://127.0.0.1:$port/ingest", method = "GET",
        basicAuth = Some(("user", "pa:ss"))))
      assert(c.deliver("hello world&x=1".getBytes, _ => ()))
      val (uri, auth) = seen.poll()
      assert(uri == "/ingest?record=hello+world%26x%3D1")
      val expected = "Basic " + java.util.Base64.getEncoder
        .encodeToString("user:pa:ss".getBytes)
      assert(auth == expected)
    }
  }

  test("deliverAsync bounds wire concurrency at maxConnections; window at requestLimits") {
    val active = new AtomicInteger(0)
    val maxActive = new AtomicInteger(0)
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.setExecutor(java.util.concurrent.Executors.newCachedThreadPool())
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val a = active.incrementAndGet()
        maxActive.updateAndGet(m => math.max(m, a))
        Thread.sleep(80) // slow server so requests pile up
        active.decrementAndGet()
        ex.sendResponseHeaders(200, -1); ex.close()
      }
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val c = new HttpConnector(HttpSinkConfig(url = s"http://127.0.0.1:$port/",
        maxConnections = 4, requestLimits = 8))
      val futs = (1 to 32).map(_ => c.deliverAsync("x".getBytes))
      val outcomes = futs.map(_.join())
      assert(outcomes.forall(_ == Sinks.Delivered))
      assert(maxActive.get() <= 4,
        s"wire concurrency ${maxActive.get()} exceeded maxConnections=4")
      assert(maxActive.get() >= 2, "delivery should actually be concurrent")
    } finally server.stop(0)
  }

  // ---- kafka projection -------------------------------------------------

  test("kafka record projection: per-event topic header beats static topic") {
    val df = spark.createDataFrame(Seq(
      ("b1", Map("topic" -> "override")),
      ("b2", Map.empty[String, String]))).toDF("body", "headers")
    val out = Sinks.kafkaRecords(df, staticTopic = Some("default"),
        topicHeader = Some("topic"))
      .collect().map(r => r.getAs[String]("value") -> r.getAs[String]("topic")).toMap
    assert(out == Map("b1" -> "override", "b2" -> "default"))
    // keys are uuids, unique
    val keys = Sinks.kafkaRecords(df, Some("t")).collect().map(_.getAs[String]("key"))
    assert(keys.distinct.length == keys.length)
  }

  // ---- syslog formatting ------------------------------------------------

  test("syslog message formats (RFC 3164 / 5424 / 6587 framing)") {
    val ts = java.time.Instant.parse("2026-03-05T07:08:09Z")
    val m3164 = Sinks.Syslog.rfc3164(1, 6, ts, "host1", "app1", "msg body")
    assert(m3164 == "<14>Mar  5 07:08:09 host1 app1: msg body")
    val m5424 = Sinks.Syslog.rfc5424(1, 6, ts, "host1", "app1", "id1", "msg")
    assert(m5424 == "<14>1 2026-03-05T07:08:09Z host1 app1 - id1 - msg")
    assert(Sinks.Syslog.octetFramed("abc") == "3 abc")
    // octet count is UTF-8 BYTES, not UTF-16 code units — "é" is 1 char, 2 bytes
    assert(Sinks.Syslog.octetFramed("é") == "2 é")
    assert(Sinks.Syslog.octetFramed("日本") == "6 日本")
  }

  test("syslog TLS (RFC 5425) round-trips against a local TLS socket with a custom CA") {
    import scala.sys.process._
    val dir = Files.createTempDirectory("graft-tls")
    val ks = dir.resolve("server.p12")
    val pem = dir.resolve("ca.pem")
    // self-signed server cert via the JDK's own keytool
    assert(Seq("keytool", "-genkeypair", "-alias", "srv", "-keyalg", "RSA",
      "-keysize", "2048", "-validity", "2", "-storetype", "PKCS12",
      "-keystore", ks.toString, "-storepass", "changeit",
      "-dname", "CN=127.0.0.1", "-ext", "SAN=IP:127.0.0.1").! == 0)
    assert(Seq("keytool", "-exportcert", "-rfc", "-alias", "srv",
      "-keystore", ks.toString, "-storepass", "changeit",
      "-file", pem.toString).! == 0)

    val ctx = graft.util.PKI.serverContext(ks, "changeit".toCharArray)
    val ss = ctx.getServerSocketFactory.createServerSocket(0)
    val received = new java.util.concurrent.LinkedBlockingQueue[String]()
    val acceptor = new Thread(() => {
      while (!ss.isClosed) {
        try {
          val s = ss.accept()
          val bytes = s.getInputStream.readAllBytes()
          if (bytes.nonEmpty)
            received.put(new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
          s.close()
        } catch { case _: Exception => () }
      }
    })
    acceptor.setDaemon(true)
    acceptor.start()
    try {
      val batch = spark.createDataFrame(Seq(("héllo wörld", Map.empty[String, String])))
        .toDF("body", "headers").coalesce(1)
      Sinks.syslogWriter("127.0.0.1", ss.getLocalPort,
        transport = Some(Sinks.SyslogTls(Some(pem.toString))))(batch)
      val frame = received.poll(15, java.util.concurrent.TimeUnit.SECONDS)
      assert(frame != null, "no TLS frame received")
      assert(frame.contains("héllo wörld"))
      // RFC 5425 octet count prefix == UTF-8 byte length of the message
      val Array(count, msg) = frame.split(" ", 2)
      assert(count.toInt ==
        msg.getBytes(java.nio.charset.StandardCharsets.UTF_8).length)
    } finally ss.close()
  }

  test("HttpConnector shared registry is LRU-bounded; evicted pools shut down") {
    val before = HttpConnector.sharedPoolCount
    // churn far past the 64-entry bound with distinct per-"tenant" urls
    val pools = (0 until 80).map { i =>
      HttpConnector.sharedFor(HttpSinkConfig(url = s"http://127.0.0.1:1/tenant-$i"))
    }
    assert(HttpConnector.sharedPoolCount <= 64,
      s"registry grew unbounded: ${HttpConnector.sharedPoolCount} (was $before)")
    assert(pools.head.exec.isShutdown, "LRU pool must be shut down on eviction")
    assert(!pools.last.exec.isShutdown, "most-recent pool must stay live")
  }
}
