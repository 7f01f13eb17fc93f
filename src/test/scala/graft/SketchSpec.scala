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

  test("hllCardinality: estimate in budget; registers shard-order-invariant and mergeable") {
    import graft.functions.{Sketches, TextFunctions => TF}
    val rep = TextAnalysis.hllCardinality(docs, "text", p = 8, "lang").collect()
    assert(rep.nonEmpty)
    rep.foreach { r =>
      val (est, exact) = (r.getAs[Double]("est_raw"), r.getAs[Long]("n_exact"))
      // raw-estimator regime + ~6.5% std error at m=256: 3 sigma budget
      assert(math.abs(est / exact - 1.0) < 0.25,
        s"HLL estimate off > 25% for ${r.getAs[String]("lang")}: $est vs $exact")
      assert(r.getAs[Int]("nonzero_regs") <= r.getAs[Int]("m"))
    }
    // determinism: the register array must not depend on partitioning
    // (merge is commutative+associative), pinned via the md5 fingerprint
    def regsOf(df: org.apache.spark.sql.DataFrame) = df
      .select(explode(TF.shingles(col("text"))).as("s"))
      .select(xxhash64(col("s")).as("h"))
      .agg(Sketches.hllRegisters(col("h"), 8).as("regs"))
      .collect()(0).getSeq[Int](0)
    val whole = regsOf(docs.repartition(7))
    assert(whole == regsOf(docs.repartition(2)), "registers depend on partitioning")
    // mergeability: element-wise max of two disjoint halves == whole corpus
    val half1 = regsOf(docs.where(col("doc_id") % 2 === 0))
    val half2 = regsOf(docs.where(col("doc_id") % 2 =!= 0))
    val merged = half1.zip(half2).map { case (a, b) => math.max(a, b) }
    assert(merged == whole, "register union is not element-wise max")
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

  test("cmsSketch: mergeable — half-corpus sketches sum cell-wise to the full sketch") {
    // the property the streaming twin (stream_heavy_hitters) rests on:
    // cell counts are plain sums, so any partition of the corpus merges
    // to the same sketch
    def cellsOf(d: org.apache.spark.sql.DataFrame) =
      TextAnalysis.cmsSketch(TextAnalysis.cmsTokens(d, "text"),
        depth = 4, width = 32)
    val full = cellsOf(docs).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    val merged = cellsOf(docs.where(col("doc_id") % 2 === 0))
      .union(cellsOf(docs.where(col("doc_id") % 2 === 1)))
      .groupBy("j", "cell").agg(sum("cnt").as("cnt")).collect()
      .map(r => (r.getInt(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(full == merged, "cell counts are not merge-additive")
    assert(full.nonEmpty)
  }

  test("bottomKSketch: rank-error bounded, partition-invariant, union-truncate mergeable") {
    import graft.functions.{Mix64, Sketches}
    // one global group over all docs: n ~ corpus size, k = 1024
    val k = 1024
    val rows = docs.select(Mix64.mix64(col("doc_id"), 0L).as("h"),
      length(col("text")).cast("long").as("v"))
    def sketchOf(d: org.apache.spark.sql.DataFrame): Seq[org.apache.spark.sql.Row] =
      d.agg(Sketches.bottomKSketch(col("h"), col("v"), k).as("sk"))
        .head.getSeq[org.apache.spark.sql.Row](0)
    val sk = sketchOf(rows)
    assert(sk == sketchOf(rows.repartition(13)), "sketch depends on partitioning")
    // sorted ascending by (h, v) — the canonical emitted order
    assert(sk == sk.sortBy(r => (r.getLong(0), r.getLong(1))))
    // union-truncate of disjoint halves == full sketch (the rollup algebra)
    val lo = sketchOf(rows.where(pmod(col("h"), lit(2L)) === 0L))
    val hi = sketchOf(rows.where(pmod(col("h"), lit(2L)) === 1L))
    val merged = (lo ++ hi).sortBy(r => (r.getLong(0), r.getLong(1))).take(k)
    assert(merged == sk, "halves do not union-truncate to the full sketch")
    // rank-error bound: the q-quantile estimate's true rank interval must
    // sit within q ± 4/sqrt(k) (4 sigma of the sampling error — the bound
    // the 100 TB report consumes). Deterministic given the fixture.
    val n = rows.count()
    val eps = 4.0 / math.sqrt(k)
    for (q <- Seq(0.5, 0.9, 0.99)) {
      val svals = sk.map(_.getLong(1)).sorted
      val est = svals(math.floor(q * (svals.size - 1)).toInt)
      val lt = rows.where(col("v") < est).count().toDouble / n
      val le = rows.where(col("v") <= est).count().toDouble / n
      assert(lt <= q + eps && le >= q - eps,
        s"q=$q estimate $est rank interval [$lt, $le] misses ${q}±$eps")
    }
  }

  test("BottomKHeap: fuzz vs a sort-based reference; merge is order-independent") {
    import graft.functions.BottomKHeap
    val rnd = graft.util.SplitMix64.generator(2026L)
    for (trial <- 1 to 50) {
      val k = 16 + (rnd().abs % 48).toInt
      val n = (rnd().abs % 400).toInt
      val pairs = Seq.fill(n)((rnd(), rnd() % 1000))
      val heap = new BottomKHeap(k)
      pairs.foreach { case (h, v) => heap.insert(h, v) }
      val expected = pairs.sorted.take(k)
      assert(heap.sortedPairs().toSeq == expected,
        s"trial $trial: heap diverged from the sort reference (k=$k, n=$n)")
      // merge: any split of the input merges to the same sketch
      val cut = if (n == 0) 0 else (rnd().abs % n).toInt
      val (l, r) = pairs.splitAt(cut)
      val hl = new BottomKHeap(k); l.foreach { case (h, v) => hl.insert(h, v) }
      val hr = new BottomKHeap(k); r.foreach { case (h, v) => hr.insert(h, v) }
      hl.mergeFrom(hr)
      assert(hl.sortedPairs().toSeq == expected, s"trial $trial: merge diverged")
      val hr2 = new BottomKHeap(k); r.foreach { case (h, v) => hr2.insert(h, v) }
      val hl2 = new BottomKHeap(k); l.foreach { case (h, v) => hl2.insert(h, v) }
      hr2.mergeFrom(hl2)
      assert(hr2.sortedPairs().toSeq == expected, s"trial $trial: merge not commutative")
    }
  }

  test("bottomKSketch: k >= n keeps every row — sketch quantiles are exact") {
    import graft.functions.{Mix64, Sketches}
    import spark.implicits._
    val vals = Seq(5L, 1L, 9L, 3L, 3L, 7L, 2L, 8L, 4L, 6L)
    val df = vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }.toDF("id", "v")
      .select(Mix64.mix64(col("id"), 0L).as("h"), col("v"))
    val out = df.agg(
        Sketches.sketchQuantile(Sketches.bottomKSketch(col("h"), col("v"), 16), 0.5).as("p50"),
        Sketches.sketchQuantile(Sketches.bottomKSketch(col("h"), col("v"), 16), 0.0).as("p0"),
        Sketches.sketchQuantile(Sketches.bottomKSketch(col("h"), col("v"), 16), 1.0).as("p100"))
      .head
    // lower-rank rule on the full sorted multiset [1,2,3,3,4,5,6,7,8,9]:
    // p50 -> rank floor(0.5*9)+1 = 5 -> 4; p0 -> 1; p100 -> 9
    assert(out.getLong(0) == 4L, s"p50 ${out.getLong(0)}")
    assert(out.getLong(1) == 1L)
    assert(out.getLong(2) == 9L)
  }

  test("bloomBits: zero false negatives — every inserted hash probes true") {
    import graft.functions.Sketches
    val (m, k) = (65536, 7)
    val hashes = TextAnalysis.shingleHashRows(docs, "text", Nil)
      .select(col("__h")).distinct()
    val words = hashes.agg(Sketches.bloomBits(col("__h"), m, k).as("words"))
    val misses = hashes.crossJoin(broadcast(words))
      .where(!Sketches.bloomMightContain(col("__h"), col("words"), m, k))
      .count()
    assert(misses == 0L, s"$misses inserted hashes probed false")
  }

  test("bloomBits: partition-invariant and OR-mergeable") {
    import graft.functions.Sketches
    val (m, k) = (4096, 5)
    val hashes = TextAnalysis.shingleHashRows(docs, "text", Nil)
      .select(col("__h"))
    def arr(df: org.apache.spark.sql.DataFrame): Seq[Long] =
      df.agg(Sketches.bloomBits(col("__h"), m, k).as("w"))
        .head.getSeq[Long](0)
    val a = arr(hashes)
    val b = arr(hashes.repartition(13))
    assert(a == b, "bit array depends on partitioning")
    // split-merge: OR of the halves equals the whole (word-wise)
    val lo = arr(hashes.where(pmod(col("__h"), lit(2L)) === 0L))
    val hi = arr(hashes.where(pmod(col("__h"), lit(2L)) === 1L))
    assert(lo.zip(hi).map { case (x, y) => x | y } == a,
      "halves do not OR-merge to the full sketch")
  }

  test("bloomBits: false-positive rate is in the sized ballpark, never optimistic about members") {
    import graft.functions.Sketches
    val (m, k) = (65536, 7)
    // members: even longs 0..9998; probes: odd longs (disjoint by parity)
    val members = spark.range(5000).select((col("id") * 2).as("h"))
    val words = members.agg(Sketches.bloomBits(col("h"), m, k).as("words"))
    val probes = spark.range(5000).select((col("id") * 2 + 1).as("h"))
    val fp = probes.crossJoin(broadcast(words))
      .where(Sketches.bloomMightContain(col("h"), col("words"), m, k))
      .count()
    // theoretical fpp at n=5000, m=65536, k=7 is ~0.6%; allow generous 3%
    assert(fp < 150L, s"false-positive count $fp of 5000 is out of ballpark")
    assert(fp > 0L || true) // fp may legitimately be 0 at this sizing
  }

  test("bloomMightContain: null hash/sketch probe false, sizing mismatch raises") {
    import graft.functions.Sketches
    import spark.implicits._
    val (m, k) = (4096, 5)
    val words = spark.range(100).select((col("id") * 3).as("h"))
      .agg(Sketches.bloomBits(col("h"), m, k).as("words"))
    // Option encodes a nullable hash column; a NULL hash (and a NULL
    // sketch) must probe FALSE, never NULL — a NULL would silently vanish
    // from sum(when(hit,...)) rollups (advisor round 10)
    val probes = Seq((1L, Some(3L)), (2L, Option.empty[Long])).toDF("id", "h")
    val hits = probes.crossJoin(broadcast(words))
      .select(Sketches.bloomMightContain(col("h"), col("words"), m, k).as("hit"))
      .collect()
    assert(hits.forall(!_.isNullAt(0)), "probe must never be NULL")
    val nullSketch = probes
      .select(Sketches.bloomMightContain(col("h"),
        lit(null).cast("array<bigint>"), m, k).as("hit"))
      .collect()
    assert(nullSketch.forall(r => !r.isNullAt(0) && !r.getBoolean(0)),
      "NULL sketch must probe false")
    // a non-null sketch of the WRONG word count is a caller bug — loud
    val bad = probes.where(col("h").isNotNull)
      .crossJoin(broadcast(words.select(slice(col("words"), 1, 10).as("words"))))
      .select(Sketches.bloomMightContain(col("h"), col("words"), m, k).as("hit"))
    val e = intercept[Exception] { bad.collect() }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("bloomMightContain")),
      s"expected the sizing raise, got: ${e.getMessage}")
  }

  test("bloomBits: nulls are skipped, not inserted") {
    import graft.functions.Sketches
    val df = spark.sql(
      "SELECT * FROM VALUES (CAST(NULL AS BIGINT)), (42L) AS t(h)")
    val words = df.agg(Sketches.bloomBits(col("h"), 64, 2).as("w"))
      .head.getSeq[Long](0)
    val onlyNull = spark.sql("SELECT CAST(NULL AS BIGINT) AS h")
      .agg(Sketches.bloomBits(col("h"), 64, 2).as("w")).head.getSeq[Long](0)
    assert(onlyNull.forall(_ == 0L), "null input set bits")
    assert(words.exists(_ != 0L), "non-null input set no bits")
  }
}
