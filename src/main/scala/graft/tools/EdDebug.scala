package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing for editDistancePairs at sf0.1 (perf debug). */
object EdDebug { def main(args: Array[String]): Unit = {
  val spark = SparkSession.builder().master("local[32]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.enabled", "false").getOrCreate()
  spark.sparkContext.setLogLevel("ERROR")
  val docs = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
  def time[T](label: String)(f: => T): T = {
    val t0 = System.nanoTime(); val r = f
    println(f"[ed] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
  }
  val alphabet = "abcdefghijklmnopqrstuvwxyz0123456789 "
  val nGroups = 19
  val groups = (0 until nGroups).map(g =>
    alphabet.zipWithIndex.collect { case (c, i) if i % nGroups == g => c }.mkString)
  val histCols = groups.zipWithIndex.map { case (chars, g) =>
    (length(col("t")) - length(expr(s"translate(t, '$chars', '')"))).as(s"h$g") }
  val s0 = docs.select(col("doc_id").as("id"),
      graft.functions.TextFunctions.normText(col("text")).as("t"))
    .withColumn("l", length(col("t"))).where(col("l") <= 512)
    .withColumn("band", (col("l") / 32).cast("int"))
  val blocks = s0.select(
      (Seq(col("id"), col("t"), col("l"), col("band"),
           explode(array(col("band"), col("band") + 1)).as("blk")) ++ histCols): _*)
    .persist()
  time("materialize blocks")(blocks.count())
  val l1 = (0 until nGroups).map(g => abs(col(s"a.h$g") - col(s"b.h$g"))).reduce(_ + _)
  val joined = blocks.as("a").join(blocks.as("b"),
    col("a.blk") === col("b.blk") && col("a.id") < col("b.id") &&
    col("a.blk") === greatest(col("a.band"), col("b.band")) &&
    abs(col("a.l") - col("b.l")) <= 16)
  time("raw candidates count")(println("  n=" + joined.count()))
  time("l1 filter count")(println("  n=" + joined.where(l1 <= 32).count()))
  time("l1+leven count")(println("  n=" + joined.where(l1 <= 32 &&
    levenshtein(col("a.t"), col("b.t"), 16) >= 0).count()))
  val cands = time("barrier: l1 survivors checkpoint")(
    joined.where(l1 <= 32)
      .select(col("a.t").as("ta"), col("b.t").as("tb")).localCheckpoint(true))
  time("leven on 43k checkpointed")(println("  n=" +
    cands.where(levenshtein(col("ta"), col("tb"), 16) >= 0).count()))
  time("leven full (no threshold) on 43k")(println("  n=" +
    cands.where(levenshtein(col("ta"), col("tb")) <= 16).count()))
  time("full op")(println("  n=" + graft.operators.Dedup.editDistancePairs(
    docs, "doc_id", "text").count()))
  spark.stop()
}}
