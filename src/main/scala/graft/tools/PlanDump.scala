package graft.tools

import org.apache.spark.sql.SparkSession

/** Debug main: print the executed plan of one gate query.
  * `sbt "runMain graft.tools.PlanDump <query> [sfDir]"` */
object PlanDump {
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
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    println(graft.SparkEntry.queries(name)(spark, dir)
      .queryExecution.executedPlan.toString)
    spark.stop()
  }
}
