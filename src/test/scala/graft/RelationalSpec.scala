package graft

import graft.operators.Relational
import org.apache.spark.sql.functions._

class RelationalSpec extends SparkSpec {

  test("profileTable: nulls/distincts/typed extrema per column, one aggregate pass") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = Seq(
      (1L, Some(10L), "b"),
      (2L, Some(2L), "a"),
      (3L, None, "a"),
      (4L, Some(10L), "c")).toDF("id", "v", "s")
    val got = graft.operators.Relational.profileTable(df, Seq(
        "id" -> col("id"), "v" -> col("v"), "s" -> col("s")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getString(4), r.getString(5))).toMap
    // typed extrema: numeric min of v is "2", not the lexicographic "10"
    assert(got("id") == ((4L, 0L, 4L, "1", "4")))
    assert(got("v") == ((4L, 1L, 2L, "2", "10")))
    assert(got("s") == ((4L, 0L, 3L, "a", "c")))
    // two deliberate passes (scalar hash agg + multi-distinct Expand),
    // cross-joined as single-row broadcasts — mixing them into one agg
    // threads every scalar through the Expand (measured 5x slower)
    val plan = graft.operators.Relational.profileTable(df, Seq(
        "id" -> col("id"), "v" -> col("v")))
      .queryExecution.executedPlan.toString
    assert(plan.contains("Expand"), s"expected multi-distinct Expand:\n$plan")
    assert(plan.contains("BroadcastNestedLoopJoin") ||
           plan.contains("CartesianProduct"),
      s"single-row results should cross-join:\n$plan")
    intercept[IllegalArgumentException] {
      graft.operators.Relational.profileTable(df, Seq.empty)
    }
  }

  test("asofJoinTolerance: fresh matches kept, stale matches nulled, forward mirror, salted identical") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val probe = Seq(("u1", 100L, "a"), ("u1", 250L, "b"), ("u2", 50L, "c"),
                    ("u1", 105L, "d")).toDF("k", "ts", "tag")
    val cl = Seq(("u1", 90L, 1L), ("u1", 200L, 2L)).toDF("k", "ts", "v")
    val got = graft.operators.Relational
      .asofJoinTolerance(probe, cl, "k", "ts", Seq("v"), tolerance = 20L)
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(got("a") == ((Some(1L), Some(90L))))   // gap 10 <= 20
    assert(got("d") == ((Some(1L), Some(90L))))   // gap 15 <= 20
    assert(got("b") == ((None, None)))            // nearest prior 200, gap 50: stale
    assert(got("c") == ((None, None)))            // no prior state at all
    // forward: the NEXT state within tolerance
    val fwd = graft.operators.Relational
      .asofJoinTolerance(probe, cl, "k", "ts", Seq("v"), tolerance = 100L,
        direction = "forward")
      .collect().map(r => r.getString(2) -> Option(r.get(3))).toMap
    assert(fwd("a") == Some(2L))  // next at 200, gap 100 <= 100 (inclusive)
    assert(fwd("b") == None)      // nothing at or after 250
    // salting must not change the output
    val salted = graft.operators.Relational
      .asofJoinTolerance(probe, cl, "k", "ts", Seq("v"), tolerance = 20L,
        saltBuckets = 4)
      .collect().map(r => r.getString(2) ->
        (Option(r.get(3)), Option(r.get(4)))).toMap
    assert(salted == got)
    intercept[IllegalArgumentException] {
      graft.operators.Relational
        .asofJoinTolerance(probe, cl, "k", "ts", Seq("v"), tolerance = -1L)
    }
  }

  test("asofJoin: latest at-or-before state; equal ts included; no prior state = null") {
    val changelog = spark.createDataFrame(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "x")))
      .toDF("k", "ts", "state")
    val probe = spark.createDataFrame(Seq(
      (100L, 1L, 5L),   // before any state → null
      (101L, 1L, 10L),  // equal ts → includes same-instant state "a"
      (102L, 1L, 19L),  // between → "a"
      (103L, 1L, 20L),  // equal to second → "b"
      (104L, 1L, 99L),  // after all → "b"
      (105L, 2L, 16L),  // other key → "x"
      (106L, 3L, 50L))) // unseen key → null
      .toDF("id", "k", "ts")
    val out = Relational.asofJoin(probe, changelog, "k", "ts", Seq("state"))
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("state"))).toMap
    assert(out == Map(100L -> None, 101L -> Some("a"), 102L -> Some("a"),
      103L -> Some("b"), 104L -> Some("b"), 105L -> Some("x"), 106L -> None))
  }

  test("asofJoin forward: earliest at-or-after state; equal ts included; nothing ahead = null") {
    val changelog = spark.createDataFrame(Seq(
      (1L, 10L, "a"), (1L, 20L, "b"), (2L, 15L, "x")))
      .toDF("k", "ts", "state")
    val probe = spark.createDataFrame(Seq(
      (100L, 1L, 5L),   // before any state → "a" (next ahead)
      (101L, 1L, 10L),  // equal ts → includes same-instant state "a"
      (102L, 1L, 11L),  // between → "b"
      (103L, 1L, 20L),  // equal to second → "b"
      (104L, 1L, 99L),  // after all → null (nothing ahead)
      (105L, 2L, 14L),  // other key → "x"
      (106L, 3L, 50L))) // unseen key → null
      .toDF("id", "k", "ts")
    val out = Relational.asofJoin(probe, changelog, "k", "ts", Seq("state"),
        direction = "forward")
      .collect().map(r => r.getAs[Long]("id") -> Option(r.getAs[String]("state"))).toMap
    assert(out == Map(100L -> Some("a"), 101L -> Some("a"), 102L -> Some("b"),
      103L -> Some("b"), 104L -> None, 105L -> Some("x"), 106L -> None))
    intercept[IllegalArgumentException](
      Relational.asofJoin(probe, changelog, "k", "ts", Seq("state"),
        direction = "sideways"))
  }

  test("rangeJoinBinned equals the direct non-equi join (boundary-inclusive start, exclusive end)") {
    val ev = graft.functions.EventTime.withEpochMs(spark.read.parquet(sf("events")))
    val probe = ev.select(col("event_id"), col("user_id"), col("ts_ms"))
    val iv = ev.where(col("event_type") === "view")
      .select(col("event_id").as("iv_id"), col("user_id").as("iv_user"),
              col("ts_ms").as("start_ms"), (col("ts_ms") + 600000L).as("end_ms"))
    val binned = Relational.rangeJoinBinned(
        probe, "ts_ms", iv.withColumnRenamed("iv_user", "user_id"),
        "start_ms", "end_ms", keyCol = Some("user_id"), binWidth = 600000L)
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val direct = probe.join(iv,
        probe("user_id") === iv("iv_user") &&
        probe("ts_ms") >= iv("start_ms") && probe("ts_ms") < iv("end_ms"))
      .select("event_id", "iv_id")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(binned == direct)
    assert(binned.nonEmpty)
  }

  test("hash split: deterministic, complete, proportional; sample consistent across invocations") {
    import graft.operators.Sampling
    val docs = spark.read.parquet(sf("documents"))
    val weights = Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1)
    val s1 = Sampling.hashSplit(docs, "doc_id", weights)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val s2 = Sampling.hashSplit(docs, "doc_id", weights)
      .select("doc_id", "split").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(s1 == s2, "assignment must be deterministic")
    assert(s1.size == docs.count())
    val frac = s1.values.count(_ == "train").toDouble / s1.size
    assert(frac > 0.7 && frac < 0.9, s"train fraction $frac off target 0.8")
    assert(s1.values.toSet == Set("train", "val", "test"))
    // sample with the default seed selects exactly the sub-threshold buckets
    val sample = Sampling.hashSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val resample = Sampling.hashSample(docs, "doc_id", 0.1)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(sample == resample && sample.nonEmpty && sample.size < s1.size)
    intercept[IllegalArgumentException](
      Sampling.hashSplit(docs, "doc_id", Seq("a" -> 0.5, "b" -> 0.4)))
  }

  test("temperature mixture: alpha flattens domains, caps at keep-all, broadcasts rates") {
    import graft.operators.Sampling
    // skewed synthetic corpus: web 400 docs, books 50, wiki 10
    val rows = (1L to 400L).map(i => (i, "web")) ++
               (401L to 450L).map(i => (i, "books")) ++
               (451L to 460L).map(i => (i, "wiki"))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "source")
    val out = Sampling.temperatureMixture(docs, "source", "doc_id",
      targetRows = 200L, alpha = 0.5)
    val rates = out.select("source", "rate_ppm").distinct().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val kept = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // expected rates from the published formula, replicated independently
    val s = math.sqrt(50.0) + math.sqrt(400.0) + math.sqrt(10.0) // name order
    def ppm(c: Long) = math.min(1000000L,
      math.floor(200.0 * math.sqrt(c.toDouble) / s / c * 1000000.0).toLong)
    assert(rates == Map("web" -> ppm(400), "books" -> ppm(50), "wiki" -> ppm(10)),
      s"rates=$rates")
    // temperature 0.5 upweights scarce domains: keep RATE must be
    // monotonically decreasing in domain size
    assert(ppm(10) > ppm(50) && ppm(50) > ppm(400))
    // wiki's fair share (200*sqrt(10)/s ≈ 21) exceeds its 10 docs → capped,
    // keeps every row
    assert(rates("wiki") == 1000000L && kept("wiki") == 10L)
    assert(kept.values.sum <= 460L && kept.values.sum > 0L)
    // deterministic re-run
    val again = Sampling.temperatureMixture(docs, "source", "doc_id",
      targetRows = 200L, alpha = 0.5).select("doc_id").collect().map(_.getLong(0)).toSet
    assert(again == out.select("doc_id").collect().map(_.getLong(0)).toSet)
    // the rate table must broadcast — the per-row decision may not shuffle docs
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), plan.take(400))
    intercept[IllegalArgumentException](
      Sampling.temperatureMixture(docs, "source", "doc_id", 250L, alpha = 0.0))
  }

  test("epoch plan: budget split by sqrt weights, scarce sources cap at maxEpochs") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.{col, lit}
    // web: 100 docs × 100 tokens = 10000 avail; wiki: 4 docs × 25 = 100
    val rows = (1L to 100L).map(i => (i, "web", 100L)) ++
               (101L to 104L).map(i => (i, "wiki", 25L))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "source", "tk")
    val out = Sampling.epochPlan(docs, "source", col("tk"),
        budgetTokens = 20000L, alpha = 0.5, maxEpochsMilli = 4000L)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
         r.getLong(5), r.getLong(6))).toMap
    // independent replica of the published formula (name-ordered fold)
    val s = math.sqrt(10000.0) + math.sqrt(100.0)
    def expect(avail: Long) = {
      val target = math.floor(20000.0 * math.sqrt(avail.toDouble) / s).toLong
      val em = math.min(4000L, 1000L * target / avail)
      (target, em, avail * em / 1000L)
    }
    val (tw, ew, pw) = expect(10000L)
    assert(out("web") == ((100L, 10000L,
      math.floor(math.sqrt(10000.0) / s * 1000000.0).toLong, tw, ew, pw)))
    // wiki's fair-share target (20000·10/110 ≈ 1818) is 18× its 100
    // available tokens → epochs cap at 4.0 and planned < target
    val (tq, eq, pq2) = expect(100L)
    assert(eq == 4000L && pq2 < tq, s"wiki: target=$tq epochs=$eq planned=$pq2")
    assert(out("wiki")._5 == 4000L && out("wiki")._6 == 400L)
    // weights partition the ppm space (up to flooring)
    val ppmSum = out.values.map(_._3).sum
    assert(ppmSum <= 1000000L && ppmSum >= 999998L, s"ppmSum=$ppmSum")
    intercept[IllegalArgumentException](
      Sampling.epochPlan(docs, "source", col("tk"), 1000L, maxEpochsMilli = 500L))
    intercept[IllegalArgumentException](
      Sampling.epochPlan(docs, "source", lit(1L), -1L))
  }

  test("deterministic order: reproducible shuffle, contiguous shards, range-partitioned plan") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    val docs = spark.createDataFrame((1L to 500L).map(i => (i, s"s$i")))
      .toDF("doc_id", "txt")
    val out = Sampling.deterministicOrder(docs, "doc_id", nShards = 8)
    val rows = out.select("doc_id", "ord", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // pure function of identity: re-run identical
    val again = Sampling.deterministicOrder(docs, "doc_id", nShards = 8)
      .select("doc_id", "ord", "shard").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(rows.toSet == again.toSet)
    // shard = the contiguous slice of the global ord order: sorting by ord
    // must produce non-decreasing shard ids, all within [0, 8)
    val byOrd = rows.sortBy(_._2)
    assert(byOrd.map(_._3).sliding(2).forall(w => w(0) <= w(1)),
      "shard ids not contiguous in ord order")
    assert(rows.forall { case (_, _, s) => s >= 0 && s < 8 })
    // a hash shuffle actually shuffles: the ord order must not be id order
    assert(byOrd.map(_._1).take(20).toSeq != (1L to 20L),
      "ord order degenerated to id order")
    // physical plan: a RANGE exchange, never a single-partition global sort
    val plan = out.queryExecution.executedPlan.toString
    assert(plan.contains("rangepartitioning"), plan.take(500))
    assert(!plan.contains("SinglePartition"), plan.take(500))
    intercept[IllegalArgumentException](
      Sampling.deterministicOrder(docs, "doc_id", nShards = 12))
  }

  test("temperature mixture: user column named 'g' survives; output collisions reject") {
    import graft.operators.Sampling
    // a frame carrying a column literally named "g" must not collide with
    // the internal join key (reserved __graft_g)
    val rows = (1L to 40L).map(i => (i, if (i <= 30) "web" else "wiki", s"g$i"))
    val docs = spark.createDataFrame(rows).toDF("doc_id", "source", "g")
    val out = Sampling.temperatureMixture(docs, "source", "doc_id",
      targetRows = 20L, alpha = 0.5)
    assert(out.columns.count(_ == "g") == 1)
    assert(out.select("g").collect().forall(_.getString(0).startsWith("g")),
      "user 'g' column values must pass through untouched")
    // pre-existing output-name collisions fail loudly instead of silently
    // duplicating columns
    val eGr = intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(
        docs.withColumnRenamed("g", "group_rows"), "source", "doc_id", 20L)
    }
    assert(eGr.getMessage.contains("group_rows"), eGr.getMessage)
    val eRk = intercept[IllegalArgumentException] {
      Sampling.temperatureMixture(
        docs.withColumnRenamed("g", Sampling.GroupKey), "source", "doc_id", 20L)
    }
    assert(eRk.getMessage.contains(Sampling.GroupKey), eRk.getMessage)
  }

  test("stratified sample: per-stratum rates, deterministic, subset of input") {
    import graft.operators.Sampling
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val s1 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.3, "fr" -> 0.5))
    val s2 = Sampling.stratifiedSample(docs, "doc_id", "lang",
      Map("en" -> 0.3, "fr" -> 0.5))
    val kept = s1.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val all = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // unlisted strata keep everything; listed strata land near their rate
    all.keys.filterNot(Set("en", "fr")).foreach(l => assert(kept(l) == all(l), l))
    assert(math.abs(kept("en").toDouble / all("en") - 0.3) < 0.15, s"en=$kept")
    assert(math.abs(kept("fr").toDouble / all("fr") - 0.5) < 0.15, s"fr=$kept")
    // deterministic: identical invocation → identical set
    assert(s1.select("doc_id").collect().map(_.getLong(0)).toSet ==
           s2.select("doc_id").collect().map(_.getLong(0)).toSet)
    intercept[IllegalArgumentException](
      Sampling.stratifiedSample(docs, "doc_id", "lang", Map("en" -> 1.5)))
  }

  test("systematicSample: exactly k slots, heavy rows win multiples, partition-invariant") {
    import graft.operators.Sampling
    import spark.implicits._
    // weights 1..20 plus one whale of 500 (total 710; k=10 -> step 71, the
    // whale must take ceil-ish 500/71 ~ 7 slots)
    val rows = ((1L to 20L).map(i => (i, i)).toSeq :+ (99L, 500L))
      .toDF("id", "w")
    val out = Sampling.systematicSample(rows, "id", col("w"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(out.values.sum == 10L, s"slots must sum to k: $out")
    assert(out(99L) >= 6L, s"the 500/710 whale must win most slots: $out")
    // exact-k invariance under partitioning (two-pass prefix sum)
    val again = Sampling.systematicSample(rows.repartition(7), "id",
        col("w"), k = 10)
      .collect().map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(again == out, "selection depends on partitioning")
    // zero-weight rows can never be selected
    val withZero = rows.union(Seq((50L, 0L)).toDF("id", "w"))
    val z = Sampling.systematicSample(withZero, "id", col("w"), k = 10)
      .collect().map(_.getLong(0)).toSet
    assert(!z.contains(50L), "zero-weight row selected")
  }

  test("weightedSample: per-row rates, monotone nesting, clamp, NULL drops") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.{col, lit}
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("doc_id").collect().map(_.getLong(0)).toSet
    // a constant rate is exactly hashSample at the same fraction
    assert(ids(Sampling.weightedSample(docs, "doc_id", lit(500000L))) ==
           ids(Sampling.hashSample(docs, "doc_id", 0.5)))
    // monotone nesting: doubling every row's rate only adds rows
    val lo = ids(Sampling.weightedSample(docs, "doc_id", col("n_chars") * 1000L))
    val hi = ids(Sampling.weightedSample(docs, "doc_id", col("n_chars") * 2000L))
    assert(lo.subsetOf(hi), s"${(lo -- hi).take(3)} kept at low rate only")
    assert(lo.nonEmpty && hi.size < docs.count(), "rates should discriminate")
    // rates clamp: >= 1e6 keeps everything, <= 0 (and NULL) keeps nothing
    assert(Sampling.weightedSample(docs, "doc_id", lit(2000000L)).count() ==
           docs.count())
    assert(Sampling.weightedSample(docs, "doc_id", lit(-5L)).count() == 0L)
    assert(Sampling.weightedSample(docs, "doc_id",
      lit(null).cast("long")).count() == 0L)
  }

  test("capPerGroup: deterministic survivors, cap honored, reserved-column guard") {
    import graft.operators.Sampling
    import org.apache.spark.sql.functions.col
    val docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    val out = Sampling.capPerGroup(docs, "source", 3,
      Seq(col("n_chars").desc, col("doc_id").asc))
    val bySrc = out.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc.values.forall(_ <= 3L), s"cap violated: $bySrc")
    // every source with >= 3 docs keeps exactly 3 (the cap binds, never
    // under-selects)
    val all = docs.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    all.foreach { case (s, n) => assert(bySrc(s) == math.min(n, 3L), s) }
    // survivors are the deterministic top-3 by (n_chars desc, doc_id asc) —
    // replicated independently on the driver
    val expected = docs.select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      .groupBy(_._2).values.flatMap(g =>
        g.sortBy(x => (-x._3, x._1)).take(3)).map(_._1).toSet
    val got = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == expected)
    // group_rank is 1-based and dense within each group (sorted by the
    // rank itself — re-sorting by n_chars alone is order-nondeterministic
    // under ties)
    val ranks = out.where(col("source") === all.keys.head)
      .orderBy("group_rank").select("group_rank")
      .collect().map(_.getLong(0)).toSeq
    assert(ranks == (1L to ranks.length).toSeq)
    intercept[IllegalArgumentException](
      Sampling.capPerGroup(out, "source", 3, Seq(col("doc_id").asc)))
    intercept[IllegalArgumentException](
      Sampling.capPerGroup(docs, "source", 0, Seq(col("doc_id").asc)))
  }

  test("rangeJoinBinned: intervals spanning multiple bins still match") {
    val iv = spark.createDataFrame(Seq((7L, 1L, 95L, 305L)))
      .toDF("iv_id", "k", "s", "e") // spans bins 0..3 at width 100
    val probe = spark.createDataFrame(Seq(
      (1L, 1L, 95L), (2L, 1L, 150L), (3L, 1L, 304L), (4L, 1L, 305L), (5L, 2L, 150L)))
      .toDF("id", "k", "ts")
    val out = Relational.rangeJoinBinned(probe, "ts", iv, "s", "e",
        keyCol = Some("k"), binWidth = 100L)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(out == Set(1L, 2L, 3L)) // 305 excluded (end-exclusive), key 2 excluded
  }

  test("asofJoin adversarial skew: one key holding 50% of rows, measured bound") {
    // the documented hot-key funnel (Relational.scala scaladoc): every even
    // probe shares key 0, so half the union sorts inside ONE task. The spec
    // bounds the cost so the funnel stays measured, not assumed.
    val n = 200000L
    val probe = spark.range(n).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 64).as("k"),
      col("id").as("ts"), col("id").as("pid"))
    // (k, ts) unique by construction: ts = 10*id is distinct per row
    val changelog = spark.range(n / 10).select(
      when(col("id") % 2 === 0, 0L).otherwise(col("id") % 64).as("k"),
      (col("id") * 10).as("ts"), col("id").as("v"))
    val t0 = System.nanoTime()
    val out = Relational.asofJoin(probe, changelog, "k", "ts", Seq("v"))
    assert(out.count() == n) // every probe row exactly once, hot key included
    val secs = (System.nanoTime() - t0) / 1e9
    assert(secs < 60.0, f"hot-key asof took $secs%.1f s — funnel regressed")
    // spot-check the carried state on the hot key: probe pid=100 (k=0,
    // ts=100) must see the latest even changelog id with 10*id <= 100 → v=10
    assert(out.where(col("pid") === 100).select("v").collect()(0).getLong(0) == 10L)
    // the salted escape hatch must produce the IDENTICAL result while
    // splitting the hot key across sub-partitions
    val salted = Relational.asofJoin(probe, changelog, "k", "ts", Seq("v"),
      saltBuckets = 8)
    assert(salted.count() == n)
    assert(salted.exceptAll(out).count() == 0 && out.exceptAll(salted).count() == 0,
      "salted as-of diverged from the unsalted result")
  }

  test("zorder: interleave matches bit-loop reference; layout files form tight boxes") {
    // exactness of the magic-mask ladder vs a driver-side bit loop
    def ref(x: Long, y: Long): Long = {
      var z = 0L
      var i = 0
      while (i < 16) {
        z |= ((x >> i) & 1L) << (2 * i)
        z |= ((y >> i) & 1L) << (2 * i + 1)
        i += 1
      }
      z
    }
    val pts = spark.createDataFrame(
        (0L until 600L).map(i => (i * 37L % 65536L, i * 91L % 65536L)))
      .toDF("x", "y")
    pts.select(col("x"), col("y"),
        Relational.zorderValue(col("x"), col("y")).as("z"))
      .collect().foreach { r =>
        assert(r.getLong(2) == ref(r.getLong(0), r.getLong(1)),
          s"(${r.getLong(0)}, ${r.getLong(1)})")
      }

    // clustering quality: each z-ordered file's (zx, zy) bounding box must
    // be far tighter than an id-sorted layout's (whose boxes span the whole
    // plane) — this is exactly the property parquet min/max skipping uses
    val ev = spark.read.parquet(sf("events")).select(col("event_id"),
      pmod(col("user_id"), lit(4096L)).as("zx"),
      pmod(floor(col("value") * 100).cast("long"), lit(4096L)).as("zy"))
    def meanBoxArea(df: org.apache.spark.sql.DataFrame): Double = {
      val boxes = df.groupBy(input_file_name().as("f"))
        .agg((max("zx") - min("zx") + 1L).as("w"),
             (max("zy") - min("zy") + 1L).as("h"))
        .collect().map(r => r.getLong(1).toDouble * r.getLong(2).toDouble)
      boxes.sum / boxes.length
    }
    val laid = Relational.zorderMaterialize(ev, "zx", "zy",
      "/tmp/graft_spec_zorder/z", files = 8)
    ev.repartitionByRange(8, col("event_id"))
      .sortWithinPartitions("event_id")
      .write.mode("overwrite").parquet("/tmp/graft_spec_zorder/naive")
    val za = meanBoxArea(laid)
    val na = meanBoxArea(spark.read.parquet("/tmp/graft_spec_zorder/naive"))
    assert(za < na / 2.0,
      f"z-order boxes should be tight: z=$za%.0f vs id-sorted=$na%.0f")
  }

  test("interleaveBySource: pos is a permutation; sources round-robin until exhausted") {
    import graft.operators.Sampling
    import spark.implicits._
    // sources with sizes 5 / 3 / 1
    val rows = ((1L to 5L).map((_, "a")) ++ (6L to 8L).map((_, "b")) ++
      Seq((9L, "c"))).toDF("doc_id", "source")
    val out = Sampling.interleaveBySource(rows, "doc_id", "source")
      .collect()
      .map(r => (r.getAs[Long]("pos"), r.getAs[String]("source"),
                 r.getAs[Long]("rank_in_source")))
      .sortBy(_._1)
    assert(out.map(_._1).toSeq == (1L to 9L), s"pos not a permutation: ${out.toSeq}")
    // while all three sources are live, order cycles a,b,c by rank then source
    assert(out.take(3).map(_._2).toSeq == Seq("a", "b", "c"), s"${out.toSeq}")
    // rank 2: c exhausted -> a,b; ranks 4,5: only a remains
    assert(out.slice(3, 5).map(_._2).toSeq == Seq("a", "b"), s"${out.toSeq}")
    assert(out.drop(7).map(_._2).forall(_ == "a"), s"${out.toSeq}")
    // within each source the ranks appear in order
    out.groupBy(_._2).foreach { case (_, g) =>
      assert(g.sortBy(_._1).map(_._3).toSeq == (1L to g.length), s"${g.toSeq}")
    }
    // determinism across re-evaluation (repartitioned input, same order)
    val again = Sampling.interleaveBySource(rows.repartition(7), "doc_id", "source")
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"))).sorted
    val first = Sampling.interleaveBySource(rows, "doc_id", "source")
      .collect().map(r => (r.getAs[Long]("pos"), r.getAs[Long]("doc_id"))).sorted
    assert(again.toSeq == first.toSeq)
  }

  test("hierarchyFlatten: chain + forest roots/depths; loud on too-shallow bound and cycles") {
    import spark.implicits._
    // forest: chain 1<-2<-3<-4<-5 (parent i-1), plus root 9 with child 10
    val nodes = Seq(
      (1L, None), (2L, Some(1L)), (3L, Some(2L)), (4L, Some(3L)),
      (5L, Some(4L)), (9L, None), (10L, Some(9L)))
      .toDF("id", "parent")
    val r = Relational.hierarchyFlatten(nodes, "id", "parent",
        maxDoublings = 3).collect()
      .map(x => x.getAs[Long]("id") ->
        ((x.getAs[Long]("root"), x.getAs[Long]("depth")))).toMap
    assert(r == Map(1L -> ((1L, 0L)), 2L -> ((1L, 1L)), 3L -> ((1L, 2L)),
      4L -> ((1L, 3L)), 5L -> ((1L, 4L)), 9L -> ((9L, 0L)),
      10L -> ((9L, 1L))), s"got $r")
    // depth 4 chain cannot resolve with 1 doubling (reach = 2): loud error
    intercept[IllegalStateException] {
      Relational.hierarchyFlatten(nodes, "id", "parent", maxDoublings = 1)
    }
    // a 2-cycle never reaches a root: loud error, not an infinite loop
    val cyc = Seq((20L, Some(21L)), (21L, Some(20L))).toDF("id", "parent")
    intercept[IllegalStateException] {
      Relational.hierarchyFlatten(cyc, "id", "parent", maxDoublings = 4)
    }
  }
}
