package graft

import graft.operators.TextAnalysis

import org.apache.spark.sql.functions._

/** Sketch-operator guarantees: the properties CMS/HLL are supposed to give
  * by construction, asserted over real corpus data so a refactor of the
  * hashing or aggregation cannot silently break them. */
class SketchSpec extends SparkSpec {

  private lazy val docs = spark.read.parquet(sf("documents"))

  test("heavyHitters: CMS never under-counts, and catches every true heavy hitter") {
    val hh = TextAnalysis.heavyHitters(docs, "text",
      depth = 4, width = 32, minCount = 20L).collect()
    assert(hh.nonEmpty, "no heavy hitters found at minCount=20")
    // one-sided error: est >= exact for every reported token
    hh.foreach { r =>
      val (est, exact, over) = (r.getAs[Long]("cms_est"),
        r.getAs[Long]("n_exact"), r.getAs[Long]("overcount"))
      assert(est >= exact, s"CMS under-counted ${r.getString(0)}: $est < $exact")
      assert(over == est - exact)
    }
    // no false negatives: every token whose EXACT count >= minCount is in
    // the report (CMS estimates dominate exact counts, so thresholding the
    // estimate can only add tokens, never drop one)
    val exactHeavy = docs
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("t"))
      .where(col("t") =!= "")
      .groupBy("t").count().where(col("count") >= 20L)
      .collect().map(_.getString(0)).toSet
    val reported = hh.map(_.getString(0)).toSet
    assert(exactHeavy.subsetOf(reported),
      s"missing true heavy hitters: ${exactHeavy -- reported}")
  }

  test("heavyHitters: a collision-free width makes the sketch exact") {
    // 2^14 cells for a ~31-token vocabulary: collisions possible but
    // vanishingly unlikely under 4 independent rows; est == exact for all
    val hh = TextAnalysis.heavyHitters(docs, "text",
      depth = 4, width = 1 << 14, minCount = 20L).collect()
    assert(hh.nonEmpty)
    hh.foreach { r =>
      assert(r.getAs[Long]("overcount") == 0L,
        s"unexpected collision at width 2^14 on ${r.getString(0)}")
    }
  }
}
