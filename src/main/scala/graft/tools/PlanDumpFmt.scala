package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug main: print the `.explain("formatted")` plan of one gate query —
  * the round-deliverable format (`plans/r<N>/<query>_{before,after}.txt`).
  * `sbt "runMain graft.tools.PlanDumpFmt <query> [sfDir]"` */
object PlanDumpFmt {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q1_agg")
    val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    spark.stop()
  }
}
