package graft

import graft.functions.Mix64
import org.apache.spark.sql.functions._

/** [[graft.functions.Mix64]] — the splitmix64 per-key selector that
  * replaced chained xxhash64 in the MLM/span-corruption plans (round 10:
  * its DuckDB replica is ~60x cheaper, which is what let the driver's
  * oracle gate fit its wall-clock budget again). Cross-engine value
  * parity is pinned by the `text_mlm_*` / `text_span_corruption*` gate
  * rows; this spec pins the JVM-side contracts. */
class Mix64Spec extends SparkSpec {

  /** Independent transcription of splitmix64.c (Vigna, public domain):
    * the n-th output of the stream seeded at `seed`. */
  private def refStream(seed: Long, n: Long): Long = {
    var z = seed + n * 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  test("mix64: codegen'd expression matches the reference mixer bit-for-bit") {
    val keys = Seq(0L, 1L, 2L, 42L, -1L, -42L, Long.MaxValue, Long.MinValue,
      599999L, 123456789012345L)
    val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
    for (seed <- Seq(0L, 13L, 17L, 22L, 31L, 35L, -7L)) {
      val got = df.select(col("k"), Mix64.mix64(col("k"), seed).as("h"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      keys.foreach { k =>
        assert(got(k) == refStream(seed, k), s"key=$k seed=$seed")
      }
    }
  }

  test("mix64: interpreted eval agrees with codegen (whole-stage off)") {
    val keys = (0L until 1000L).toSeq
    val df = spark.createDataFrame(keys.map(Tuple1(_))).toDF("k")
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
                "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val got = df.select(Mix64.mix64(col("k"), 13L).as("h"))
        .collect().map(_.getLong(0))
      assert(got.toSeq == keys.map(refStream(13L, _)))
    }
  }

  test("mix64: pmod selection is unbiased enough for ppm thresholds") {
    // 100k consecutive keys, 15% threshold: expect 15000 +- ~1%
    val df = spark.range(100000L)
    val n = df.where(pmod(Mix64.mix64(col("id"), 13L),
        lit(1000000L)) < 150000L).count()
    assert(math.abs(n - 15000L) < 1000L, s"selected $n of 100k at 15%")
  }

  test("mix64: different seeds decorrelate on the same key space") {
    val df = spark.range(100000L)
    val both = df.where(
      pmod(Mix64.mix64(col("id"), 13L), lit(1000000L)) < 150000L &&
      pmod(Mix64.mix64(col("id"), 17L), lit(1000000L)) < 150000L).count()
    // independent 15% selections overlap ~2.25%; correlated ones ~15%
    assert(both > 1500L && both < 3200L, s"joint selection $both of 100k")
  }

  test("mix64: null propagates") {
    val df = spark.sql("SELECT CAST(NULL AS BIGINT) AS k")
    assert(df.select(Mix64.mix64(col("k"), 13L)).collect().head.isNullAt(0))
  }

  private def withSQLConf(pairs: (String, String)*)(f: => Unit): Unit = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None)    => spark.conf.unset(k)
    }
  }
}
