package graft.tools

import java.net.URI
import java.net.http.{HttpClient, HttpRequest, HttpResponse}
import java.util.concurrent.TimeUnit

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.Trigger

object HttpPushDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.streams.addListener(new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
      override def onQueryProgress(e: QueryProgressEvent): Unit =
        e.progress.sources.foreach(sp => println(
          s"[dbg] PROGRESS desc=${sp.description} start=${sp.startOffset} end=${sp.endOffset}"))
    })
    val port = { val ss = new java.net.ServerSocket(0)
      try ss.getLocalPort finally ss.close() }
    val work = java.nio.file.Files.createTempDirectory("hpdbg")
    val query = spark.readStream.format("http-push")
      .option("port", port.toString).load()
      .writeStream.format("memory").queryName("dbg")
      .option("checkpointLocation", work.resolve("ck").toString)
      .trigger(Trigger.ProcessingTime(100)).start()
    Thread.sleep(2000)
    val ep = graft.sources.http.HttpPushRegistry.lookup(port)
    println(s"[dbg] endpoint after start: $ep")
    val client = HttpClient.newHttpClient()
    val f = client.sendAsync(
      HttpRequest.newBuilder(URI.create(s"http://127.0.0.1:$port/"))
        .POST(HttpRequest.BodyPublishers.ofString("a\nb")).build(),
      HttpResponse.BodyHandlers.discarding())
    (1 to 20).foreach { i =>
      Thread.sleep(500)
      val lat = ep.map(_.latest)
      println(s"[dbg] t=${i * 500}ms latest=$lat respDone=${f.isDone} " +
        s"rows=${spark.sql("select count(*) from dbg").collect()(0).getLong(0)}")
      if (f.isDone) {
        println(s"[dbg] status=${f.get().statusCode()}")
        query.stop(); spark.stop(); sys.exit(0)
      }
    }
    println("[dbg] TIMEOUT — commit never released the ack")
    query.stop(); spark.stop()
  }
}
