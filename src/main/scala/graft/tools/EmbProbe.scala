package graft.tools

import graft.operators.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the embedding ingest loop (round-14
  * diagnosis of the 55 s gate). */
object EmbProbe {
  def main(args: Array[String]): Unit = {
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder().master("local[8]")
      .appName("emb-probe")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[emb] $tag: ${(System.nanoTime() - t0) / 1e9}%.2fs"); t0 = System.nanoTime()
    }
    val emb = spark.read.parquet(s"$sf/embeddings.parquet")
    emb.count(); lap("load")
    val bounds = Seq((0L, 150L), (150L, 400L), (400L, Long.MaxValue))
    val batches = bounds.map { case (lo, hi) =>
      emb.where(col("vec_id") >= lo && col("vec_id") < hi)
        .select(col("vec_id").as("id"), col("embedding").as("vec")) }
    Dedup.initEmbedIndex(batches.head, "emb_probe_idx", "/tmp/emb_probe_idx", 8)
    lap("init")
    batches.zipWithIndex.foreach { case (b, i) =>
      val surv = Dedup.embedSurvivorsIndexed(b, spark.table("emb_probe_idx"), 0.4)
        .where(col("survives")).select(col("id"), col("vec"))
      lap(s"probe$i")
      Dedup.appendEmbedIndex(surv, "emb_probe_idx", 8)
      lap(s"append$i")
    }
    spark.sql("DROP TABLE IF EXISTS emb_probe_idx")
    // survivor counts by threshold (gate-signal tuning)
    for (t <- Seq(0.2, 0.25, 0.3, 0.35, 0.4)) {
      spark.sql("DROP TABLE IF EXISTS emb_probe_t")
      val n = Dedup.embedIngest(batches, "emb_probe_t",
        s"/tmp/emb_probe_t_$t", 8, threshold = t).count()
      println(s"[emb] threshold=$t survivors=$n")
    }
    spark.sql("DROP TABLE IF EXISTS emb_probe_t")
    spark.stop()
  }
}
