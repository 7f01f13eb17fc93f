package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Minimal watermark late-drop probe: batch 0 sets W high, batch 1 sends a
  * deeply-late row — does append-mode windowed agg drop it? */
object WmDebug { def main(args: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("WARN")
  import spark.implicits._
  val work = java.nio.file.Files.createTempDirectory("graft-wm")
  val in = work.resolve("in"); java.nio.file.Files.createDirectories(in)
  val h = 3600000L
  def write(name: String, rows: Seq[Long], mtime: Long): Unit = {
    val part = work.resolve(name + "_t")
    rows.toDF("ms").select(timestamp_millis(col("ms")).as("ts"), lit(1L).as("v"))
      .coalesce(1).write.parquet(part.toString)
    val src = part.toFile.listFiles().find(_.getName.startsWith("part-")).get
    val dst = in.resolve(name + ".parquet").toFile
    require(src.renameTo(dst) && dst.setLastModified(mtime))
  }
  // batch 0: rows at hour 10 -> W after batch 0 = 10:00ish - 1h
  write("b0", Seq(10 * h + 5), 1700000000000L)
  // batch 1: one row at hour 1 (deep late), one at hour 10 + 30 min (fresh)
  write("b1", Seq(1 * h + 5, 10 * h + 1800000), 1700000060000L)
  val incoming = spark.readStream
    .schema("ts timestamp, v long")
    .option("maxFilesPerTrigger", 1).parquet(in.toString)
  val out = work.resolve("out").toString
  val q = incoming.withWatermark("ts", "1 hour")
    .groupBy(window(col("ts"), "1 hour"))
    .agg(count(lit(1)).as("n"))
    .select(unix_millis(col("window.start")).as("ws"), col("n"))
    .writeStream.outputMode("append")
    .option("checkpointLocation", work.resolve("ck").toString)
    .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
    .format("parquet").option("path", out).start()
  q.awaitTermination()
  println("[wm] result:")
  spark.read.parquet(out).orderBy("ws")
    .collect().foreach(r => println(s"[wm] ws=${r.getLong(0) / h}h n=${r.getLong(1)}"))
  // batches actually run:
  println("[wm] offsets: " + work.resolve("ck/offsets").toFile.listFiles().length)
  spark.stop()
}}
