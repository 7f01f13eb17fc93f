package graft

import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}

/** Benchmark main: runs every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE bare JSON line on stdout (sbt is configured with
  * StdoutOutput so no logger prefix corrupts it), plus writes the same
  * line to BENCH_LOCAL.json as a file-channel fallback.
  *
  * Each query is materialized with a noop-format write (a bare count()
  * would let Catalyst prune most of the computation) and executed TWICE:
  * the first pass pays JIT/codegen/IO warm-up, the reported number is the
  * second, steady-state pass — per-round numbers would otherwise book
  * first-call compilation against whichever queries run early
  * (round-1 bench: q1_agg 18.3s cold vs 1.3s warm). */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def runOnce(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir)
            .write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[bench] $name failed: ${e.getMessage}")
          false
        }
      ((System.nanoTime() - t0) / 1e9, ok)
    }

    // SPARK_GRAFT_ONLY=a,b,c restricts the run (local iteration); unset = all
    val names = sys.env.get("SPARK_GRAFT_ONLY") match {
      case Some(only) => only.split(',').map(_.trim).filter(_.nonEmpty).toSeq
      case None       => SparkEntry.queries.keys.toSeq.sorted
    }
    val wall0 = System.nanoTime()
    val cold = names.map(n => n -> runOnce(n)) // warm-up pass: JIT, codegen, page cache
    val results = names.map(n => n -> runOnce(n)) // steady-state pass
    val wall = (System.nanoTime() - wall0) / 1e9

    def qmap(rs: Seq[(String, (Double, Boolean))]): String =
      rs.map { case (k, (v, _)) => "\"" + k + f"""\":$v%.3f""" }
        .mkString("{", ",", "}")
    val total = results.map(_._2._1).sum
    // a failed query records a near-zero time — without an explicit failure
    // list a broken run would read as a speedup
    val failed = (results ++ cold).collect { case (k, (_, false)) => "\"" + k + "\"" }
      .distinct.mkString("[", ",", "]")
    // queries_cold beside the steady-state map so round-over-round deltas
    // stop mixing cold and warm numbers (round-2 verdict item 7)
    val line =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":${qmap(results)},"queries_cold":${qmap(cold)},"sf":"$sfDir","passes":2,"wall_both_passes_sec":$wall%.3f,"failed":$failed}"""
    println(line)
    try Files.writeString(Paths.get("BENCH_LOCAL.json"), line + "\n")
    catch { case _: Throwable => () }
    spark.stop()
  }
}
