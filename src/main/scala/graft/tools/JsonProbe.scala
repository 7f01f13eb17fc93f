package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-off timing probe for the events_json gate query: isolates scan,
  * JSON parse (get_json_object vs from_json vs variant), and global sort. */
object JsonProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val ev = spark.read.parquet(s"$sfDir/events.parquet")

    def time(name: String)(df: => DataFrame): Unit = {
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        df.write.format("noop").mode("overwrite").save()
        println(f"[jsonprobe] $name%-22s iter=$i t=${(System.nanoTime() - t0) / 1e9}%.2fs")
      }
    }

    time("scan_only")(ev.select("event_id", "props"))
    time("gjo_nosort")(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k")))
    time("gjo_sort")(ev.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k")).orderBy("event_id"))
    val sch = StructType(Seq(StructField("k", LongType)))
    time("fromjson_sort")(ev.select(col("event_id"),
      from_json(col("props"), sch).getField("k").as("k")).orderBy("event_id"))
    time("sort_only")(ev.select("event_id", "props").orderBy("event_id"))
    spark.stop()
  }
}
