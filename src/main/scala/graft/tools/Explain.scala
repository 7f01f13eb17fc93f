package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Dump formatted physical plans for the headline queries — the
  * would-this-survive-100TB review loop. Run:
  * `sbt "runMain graft.tools.Explain [query ...]"`. */
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_agg", "q3_topk", "q5_join", "pipe_transform", "sim_topk",
               "dedup_minhash", "dedup_embedding", "stream_hour_window")
    names.foreach { n =>
      println(s"\n======== $n ========")
      SparkEntry.queries(n)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
