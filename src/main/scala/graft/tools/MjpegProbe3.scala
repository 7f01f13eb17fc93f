package graft.tools
import org.apache.spark.sql.SparkSession
object MjpegProbe3 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def time(tag: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[probe] $tag%-24s ${(System.nanoTime() - t0) / 1e9}%7.2fs")
    }
    for (q <- Seq("mm_video_mjpeg", "mm_phash", "mm_video_fingerprint",
                  "pipeline_mm_ingest", "mm_audio_fingerprint"); i <- 1 to 2)
      time(s"$q pass $i")(
        graft.SparkEntry.queries(q)(spark, "/root/testdata/sf0.1")
          .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
