package graft.tools

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object MinhashDebug {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    var t0 = System.nanoTime()
    def lap(tag: String): Unit = {
      println(f"[dbg] $tag: ${(System.nanoTime() - t0) / 1e9}%.1fs"); t0 = System.nanoTime()
    }
    val docs = spark.read.parquet(sys.env.getOrElse("MHDBG_SF", "/root/testdata/sf0.001") + "/documents.parquet")
    println("shingle count: " + docs.select(size(TF.shingleHashes(col("text"), 3)).as("n"))
      .agg(sum("n"), avg("n")).collect().mkString)
    lap("shingles")
    val sigsOnly = docs.select(col("doc_id").as("id"),
      TF.minhashSignature(TF.shingleHashes(col("text"), 3), 128).as("sig"))
    println("sig rows: " + sigsOnly.count())
    lap("signatures")
    val sigs = sigsOnly.withColumn("band", explode(TF.lshBandKeys(col("sig"), 16, 8)))
    println("band rows: " + sigs.count())
    lap("bands")
    val cands = sigs.as("a").join(sigs.as("b"),
        col("a.band") === col("b.band") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
    println("candidate rows (pre-distinct): " + cands.count())
    lap("join-count")
    println("full operator pairs: " + graft.operators.Dedup.minhashLshPairs(
      docs, "doc_id", "text").count())
    lap("full-operator")
    spark.stop()
  }
}
