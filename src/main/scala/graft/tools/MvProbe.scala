package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object MvProbe { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[4]")
    .config("spark.ui.enabled","false")
    .config("spark.sql.shuffle.partitions","4")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.extensions", "graft.GraftExtensions")
    .getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  import graft.functions.{TextFunctions => TF}
  val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    .where(col("doc_id").isin(89L, 114L))
  val sets = docs.select(col("doc_id"),
    TF.shingleHashes(col("text"), 3).as("hs"))
  val sigs = sets.select(col("doc_id"), size(col("hs")).as("n"),
    TF.minhashSignature(col("hs"), 128).as("sig"))
  val rows = sigs.collect()
  rows.foreach { r =>
    println(s"doc=${r.getLong(0)} n=${r.getInt(1)}")
  }
  val s0 = rows(0).getSeq[Long](2); val s1 = rows(1).getSeq[Long](2)
  val agree = s0.zip(s1).count { case (x,y) => x == y }
  println(s"sig agreement: $agree/128")
  // band keys at bands=64, rows=2
  val bk = sigs.select(col("doc_id"), TF.lshBandKeys(col("sig"), 64, 2).as("bands")).collect()
  val b0 = bk(0).getSeq[Long](1).toSet; val b1 = bk(1).getSeq[Long](1).toSet
  println(s"shared bands: ${b0.intersect(b1).size} of 64")
  spark.stop()
}}
