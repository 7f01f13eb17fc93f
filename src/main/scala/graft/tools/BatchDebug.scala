package graft.tools

import graft.event.Event
import graft.streaming.BatchSemantics
import org.apache.spark.sql.{Encoders, SparkSession}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

object BatchDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    implicit val sq = spark.sqlContext
    implicit val enc = Encoders.product[(String, Event)]
    val input = MemoryStream[(String, Event)]
    val batches = BatchSemantics.batchByTag(input.toDS(),
      BatchSemantics.Config(batchSize = 3, batchTimeoutMillis = 0))
    val work = java.nio.file.Files.createTempDirectory("bdbg")
    val q = batches.writeStream.format("memory").queryName("b_out")
      .option("checkpointLocation", work.resolve("ck").toString)
      .outputMode("append").start()
    input.addData(("A", Event("a1")), ("A", Event("a2")), ("B", Event("b1")))
    (1 to 30).foreach { i =>
      Thread.sleep(500)
      println(s"[bdbg] t=${i*500} status=${q.status.message} " +
        s"active=${q.isActive} exc=${q.exception.map(_.getMessage)}")
      if (!q.isActive || i == 10) {
        q.exception.foreach(e => { println("[bdbg] CAUSE: " + e.cause); e.printStackTrace() })
        if (!q.isActive) { spark.stop(); sys.exit(1) }
      }
      if (i == 10) {
        println("[bdbg] rows=" + spark.sql("select count(*) from b_out").collect()(0).getLong(0))
        input.addData(("A", Event("a3")))
      }
      if (i == 20) {
        println("[bdbg] rows after flush=" + spark.sql("select * from b_out").collect().mkString)
        q.stop(); spark.stop(); sys.exit(0)
      }
    }
  }
}
