package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off timing probe for the connected-components round structure. */
object CcProbe {
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
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      val pairs = Dedup.ngramJaccardPairs(docs, "doc_id", "text",
        shingleN = 3, threshold = 0.5, maxDocFreq = Long.MaxValue)
      val t1 = System.nanoTime()
      val (lab, rounds) = Dedup.connectedComponentsWithRounds(docs, pairs, "doc_id")
      lab.write.format("noop").mode("overwrite").save()
      val t2 = System.nanoTime()
      println(f"[ccprobe] iter=$i pairs=${(t1 - t0) / 1e9}%.2fs cc=${(t2 - t1) / 1e9}%.2fs rounds=$rounds")
      graft.util.Materialize.release()
    }
    spark.stop()
  }
}
