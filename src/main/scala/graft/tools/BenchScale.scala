package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dedup-family scale check (round-7 item 5): the largest corpus on disk is
  * sf0.1 (5 000 docs) — thin evidence for 100 TB claims. This main
  * synthesizes a seed-free DETERMINISTIC `factor`× corpus from sf0.1 by
  * self-union with id remap, where variant k's text is passed through a
  * letter-rotation bijection (`translate` by alphabet rotated k): lengths
  * and intra-variant duplicate structure are preserved EXACTLY (the same
  * bijection hits both members of every original dup pair) while
  * cross-variant shingles share nothing, so the workload grows linearly by
  * construction — any superlinear runtime is the operator's own scaling
  * behavior, not a synthetic pair blow-up. It then runs the heaviest
  * document-dedup gate queries at sf0.1 and at the synthesized corpus
  * (two passes each, steady-state reported) and writes `BENCH_SCALE.json`
  * with per-query ratios, flagging any query whose steady-state grew more
  * than `SUPERLINEAR_SLACK` × factor.
  *
  * Run: `sbt "runMain graft.tools.BenchScale"` (quiet box). */
object BenchScale {

  val Factor = 10
  val SuperlinearSlack = 1.5 // log-factors + constant offsets allowance
  val ScaleDir = "/tmp/graft_scale_sf1"

  // heaviest gate queries that read ONLY the documents table
  val Queries = Seq(
    "dedup_exact", "dedup_minhash", "dedup_minhash_verified",
    "dedup_clusters", "dedup_fuzzy_pipeline", "dedup_spans_applied",
    "dedup_lines", "dedup_boilerplate")

  private def num(v: Double, d: Int): String =
    String.format(java.util.Locale.ROOT, s"%.${d}f", java.lang.Double.valueOf(v))

  /** Build the factor× corpus under [[ScaleDir]] (idempotent overwrite). */
  def synthesize(spark: SparkSession, srcDir: String): Unit = {
    val docs = spark.read.parquet(s"$srcDir/documents.parquet")
    val alpha = "abcdefghijklmnopqrstuvwxyz"
    val variants = (0 until Factor).map { k =>
      val rot = alpha.drop(k) + alpha.take(k)
      docs.select(
        (col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
        translate(col("text"), alpha + alpha.toUpperCase,
                  rot + rot.toUpperCase).as("text"),
        col("lang"), col("source"), col("n_chars"))
    }
    variants.reduce(_ unionByName _)
      .repartition(32)
      .write.mode("overwrite").parquet(s"$ScaleDir/documents.parquet")
  }

  private def runOnce(spark: SparkSession, name: String, dir: String): Double = {
    val t0 = System.nanoTime()
    graft.SparkEntry.queries(name)(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val t = (System.nanoTime() - t0) / 1e9
    graft.util.Materialize.release()
    t
  }

  def main(args: Array[String]): Unit = {
    val sf01 = "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench-scale")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    synthesize(spark, sf01)
    val nSmall = spark.read.parquet(s"$sf01/documents.parquet").count()
    val nBig = spark.read.parquet(s"$ScaleDir/documents.parquet").count()
    System.err.println(s"[scale] corpus: $nSmall -> $nBig docs")

    // steady state: two passes per (query, dir), warm reported
    def steady(name: String, dir: String): Double = {
      runOnce(spark, name, dir); runOnce(spark, name, dir)
    }
    val rows = Queries.map { q =>
      val small = steady(q, sf01)
      val big = steady(q, ScaleDir)
      val ratio = if (small > 0) big / small else Double.PositiveInfinity
      System.err.println(f"[scale] $q%-24s sf0.1=$small%6.2fs ${Factor}x=$big%6.2fs ratio=$ratio%5.2f")
      (q, small, big, ratio)
    }
    val superlinear = rows.collect {
      case (q, _, _, r) if r > SuperlinearSlack * Factor => q }
    val json =
      s"""{"factor":$Factor,"docs_small":$nSmall,"docs_big":$nBig,"slack":${num(SuperlinearSlack, 2)},""" +
      s""""queries":{${rows.map { case (q, s, b, r) =>
            s""""$q":{"sf01_sec":${num(s, 3)},"scaled_sec":${num(b, 3)},"ratio":${num(r, 2)}}"""
          }.mkString(",")}},""" +
      s""""superlinear":[${superlinear.map("\"" + _ + "\"").mkString(",")}]}"""
    Files.writeString(Paths.get("BENCH_SCALE.json"), json + "\n")
    println(json)
    if (superlinear.nonEmpty)
      System.err.println(s"[scale] SUPERLINEAR: ${superlinear.mkString(", ")}")
    spark.stop()
  }
}
