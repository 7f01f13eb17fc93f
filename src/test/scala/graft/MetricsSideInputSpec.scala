package graft

import graft.event.Event
import graft.metrics.Metrics
import graft.sources.CachedSideInput
import graft.streaming.BatchSemantics

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

class MetricsSideInputSpec extends SparkSpec {

  test("observe() counters reach the metrics registry per micro-batch") {
    Metrics.install(spark)
    val work = Files.createTempDirectory("graft-metrics")
    val in = work.resolve("in"); Files.createDirectories(in)
    Files.write(in.resolve("a.txt"), "one\ntwo\nthree\n".getBytes)
    val events = graft.sources.Sources.directoryWatch(spark, in.toString)
    val q = Metrics.observed(events.toDF, "flow")
      .writeStream.format("noop")
      .queryName("metrics_q")
      .option("checkpointLocation", work.resolve("ck").toString)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(30000)
    assert(Metrics.gauge("metrics_q", "flow.n_events").contains(3L))
    assert(Metrics.gauge("metrics_q", "flow.n_bytes").contains(11L)) // 3+3+5
    assert(Metrics.gauge("metrics_q", "numInputRows").contains(3L))
  }

  test("cached side input: broadcast snapshot, scheduled refresh, stale-on-failure") {
    val calls = new AtomicInteger(0)
    val side = CachedSideInput.getOrCreate[Map[String, Int]](
      "dims", spark,
      fetch = () => {
        val n = calls.incrementAndGet()
        if (n == 2) throw new RuntimeException("fetch down") // refresh fails once
        Map("version" -> n)
      },
      refreshEveryMillis = 200)
    try {
      assert(side.current().value == Map("version" -> 1))
      // tasks read the broadcast inside a distributed operation
      val bc = side.current()
      val summed = spark.range(10)
        .mapPartitions(it => it.map(_ => bc.value("version")))(Encoders.scalaInt)
        .reduce(_ + _)
      assert(summed == 10)
      // wait past ≥2 refresh ticks: one fails (stale kept), next succeeds.
      // Generous deadline: under full-suite load the broadcast inside a
      // refresh can serialize behind other suites' Spark jobs for seconds.
      val deadline = System.nanoTime() + 60e9.toLong
      while (calls.get() < 3 && System.nanoTime() < deadline) Thread.sleep(50)
      assert(calls.get() >= 3, s"refresh never advanced; lastError=${side.lastRefreshError}")
      assert(side.current().value("version") >= 3) // advanced past the failure
    } finally CachedSideInput.remove("dims")
  }

  test("streaming count-or-timeout batching flushes at the size boundary") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(String, Event)]
    val input = MemoryStream[(String, Event)]
    val batches = BatchSemantics.batchByTag(input.toDS(),
      BatchSemantics.Config(batchSize = 3, batchTimeoutMillis = 0))
    val work = Files.createTempDirectory("graft-batchstream")
    val q = batches.writeStream.format("memory").queryName("batch_out")
      .option("checkpointLocation", work.resolve("ck").toString)
      .outputMode("append")
      .start()
    // NOTE: processAllAvailable never returns here — a stateful query with
    // ProcessingTimeTimeout keeps running "cleaning up state" no-data
    // batches while state exists. Poll the sink with a deadline instead.
    def rowCount(): Long =
      spark.sql("select count(*) from batch_out").collect()(0).getLong(0)
    def awaitRows(n: Long): Unit = {
      val deadline = System.nanoTime() + 30e9.toLong
      while (rowCount() < n && System.nanoTime() < deadline) Thread.sleep(200)
    }
    try {
      input.addData(("A", Event("a1")), ("A", Event("a2")), ("B", Event("b1")))
      Thread.sleep(3000) // let several batches run
      // A has 2 buffered (below size), B has 1 — nothing flushed yet
      assert(rowCount() == 0)
      input.addData(("A", Event("a3")), ("A", Event("a4")))
      awaitRows(1)
      // A reached 3 → one flush of exactly [a1,a2,a3]; a4 stays buffered
      val rows = spark.sql("select * from batch_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[String]("tag") == "A")
      assert(rows(0).getAs[scala.collection.Seq[String]]("bodies").toSeq == Seq("a1", "a2", "a3"))
      assert(rows(0).getAs[Boolean]("sizeFlush"))
    } finally q.stop()
  }

  test("streaming batching flushes a partial buffer when the timeout fires") {
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(String, Event)]
    val input = MemoryStream[(String, Event)]
    val batches = BatchSemantics.batchByTag(input.toDS(),
      BatchSemantics.Config(batchSize = 100, batchTimeoutMillis = 1500))
    val work = Files.createTempDirectory("graft-batchtimer")
    val q = batches.writeStream.format("memory").queryName("batch_timer_out")
      .option("checkpointLocation", work.resolve("ck").toString)
      .outputMode("append")
      .start()
    try {
      input.addData(("T", Event("t1")), ("T", Event("t2")))
      // well below batchSize — only the processing-time timer can flush
      val deadline = System.nanoTime() + 30e9.toLong
      def rows() = spark.sql("select * from batch_timer_out").collect()
      while (rows().isEmpty && System.nanoTime() < deadline) Thread.sleep(250)
      val out = rows()
      assert(out.length == 1)
      assert(out(0).getAs[String]("tag") == "T")
      assert(out(0).getAs[scala.collection.Seq[String]]("bodies").toSeq == Seq("t1", "t2"))
      assert(!out(0).getAs[Boolean]("sizeFlush")) // timer flush, not size
    } finally q.stop()
  }
}
