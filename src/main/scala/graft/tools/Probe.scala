package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
object Probe { def main(a: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[2]").config("spark.ui.enabled","false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  import spark.implicits._
  val df = Seq(("hello world this is a longer string to check no mime line breaks appear at 76 chars boundary ok")).toDF("s")
  println("B64=" + df.select(base64(to_binary(col("s"), lit("utf-8")))).first().getString(0))
  println("INTERSECT=" + Seq(1).toDF("x").select(array_intersect(array(lit("a"),lit("a"),lit("b"),lit("c")), array(lit("a"),lit("b")))).first().getSeq[String](0))
  println("CAST35=" + Seq(1).toDF("x").select(lit(3.5).cast("long"), (lit(7L)/lit(2L)), floor(lit(7L)/lit(2L))).first())
  println("SPLITEMPTY=" + Seq(1).toDF("x").select(size(split(lit(""), " ")), size(split(lit("a b"), " "))).first())
  val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").orderBy("vec_id")
  println("COS01=" + graft.operators.Similarity.bruteForceTopK(emb, "vec_id", "embedding",
    emb.limit(1).select(col("vec_id").as("qid"), col("embedding").as("qvec")), "qid", "qvec", 2).collect().mkString(","))
  spark.stop()
}}
