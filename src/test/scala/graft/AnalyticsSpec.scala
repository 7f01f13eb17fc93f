package graft

import graft.operators.Analytics
import org.apache.spark.sql.functions._

/** Semantics of the behavioral-analytics operators on hand-built inputs
  * where the expected funnel/retention/join results are known by eye. */
class AnalyticsSpec extends SparkSpec {
  import spark.implicits._

  // (user, type, ts)
  private def ev(rows: (Long, String, Long)*) =
    rows.toDF("u", "et", "t")

  test("funnel: strict ordering, first-touch chaining, window bound") {
    val events = ev(
      // u1 completes A→B→C in order
      (1L, "A", 100L), (1L, "B", 200L), (1L, "C", 300L),
      // u2 has B BEFORE A only — never reaches step 2
      (2L, "B", 50L), (2L, "A", 100L), (2L, "C", 200L),
      // u3 reaches B but its C is outside the 1000ms window from B
      (3L, "A", 0L), (3L, "B", 500L), (3L, "C", 2000L),
      // u4 never signs up
      (4L, "B", 10L), (4L, "C", 20L))
    val out = Analytics.funnel(events, "u", "et", "t", Seq("A", "B", "C"),
      windowMs = Some(1000L)).collect()
    val users = out.map(r => r.getAs[String]("step_name") -> r.getAs[Long]("users")).toMap
    assert(users == Map("A" -> 3L, "B" -> 2L, "C" -> 1L))
    val pct = out.map(r => r.getAs[Int]("step") -> r.getAs[Double]("pct")).toMap
    assert(pct(1) == 1.0 && pct(3) == 1.0 / 3.0)
  }

  test("funnel: earliest qualifying time feeds the next step") {
    // u1's first B (t=150) qualifies; the later B (t=900) must NOT push
    // the C window: C at t=1100 is within 1000 of 150? no — but the greedy
    // reach time is 150, so C must be in (150, 1150]: t=1100 qualifies.
    val events = ev(
      (1L, "A", 100L), (1L, "B", 150L), (1L, "B", 900L), (1L, "C", 1100L))
    val out = Analytics.funnel(events, "u", "et", "t", Seq("A", "B", "C"),
      windowMs = Some(1000L)).collect()
    assert(out.map(_.getAs[Long]("users")).toSeq == Seq(1L, 1L, 1L))
  }

  test("retention: cohort = first week, offsets count distinct users") {
    val wk = 1000L // small bucket for the test
    val events = ev(
      (1L, "x", 0L), (1L, "x", 500L),   // u1 cohort 0, active wk 0
      (1L, "x", 2500L),                  // ... and wk 2
      (2L, "x", 100L), (2L, "x", 1100L), // u2 cohort 0, active wk 0,1
      (3L, "x", 2100L))                  // u3 cohort 2
    val out = Analytics.retention(events, "u", "t", bucketMs = wk)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getAs[Long]("cohort_size"), r.getAs[Double]("rate")))
    assert(out.toSeq == Seq(
      (0L, 0L, 2L, 2L, 1.0), (0L, 1L, 1L, 2L, 0.5), (0L, 2L, 1L, 2L, 0.5),
      (2L, 0L, 1L, 1L, 1.0)))
  }

  test("madOutliers: flags the planted outlier, spares the bulk; exact medians") {
    // group A: 1..9 plus a wild point 1000 — median 5.5, MAD 2.5;
    //   dev(1000) = 994.5 > 5·2.5 — flagged; dev(9) = 3.5 — spared
    // group B: constant values (MAD 0) — every equal value spared
    val rows = ((1L to 9L).map(v => ("A", v)) :+ (("A", 1000L))) ++
      Seq(("B", 7L), ("B", 7L), ("B", 7L))
    val df = rows.zipWithIndex
      .map { case ((g, v), i) => (i.toLong, g, v) }.toDF("id", "g", "v")
    val out = Analytics.madOutliers(df, "g", "v", nMads = 5.0).collect()
    assert(out.length == 1)
    assert(out.head.getAs[Long]("v") == 1000L)
    assert(out.head.getAs[Double]("dev") == 994.5) // median of {1..9,1000} = 5.5
    assert(out.head.getAs[Double]("mad") == 2.5)   // devs {.5,.5,1.5,1.5,2.5,2.5,...} -> p50
  }

  test("saltedJoin: identical result to the plain join; shuffled-hash plan") {
    // skewed probe: one hot key (90% of rows)
    val probe = (1L to 200L).map(i =>
      (i, if (i <= 180) 1L else i % 7 + 1)).toDF("row_id", "k")
    val build = (1L to 8L).map(i => (i, s"dim_$i")).toDF("k", "name")
    val salted = Analytics.saltedJoin(probe, build, "k", nSalts = 4,
      saltSrc = col("row_id"))
    val plain = probe.join(build, "k")
    assert(salted.count() == plain.count())
    assert(salted.select("row_id", "k", "name").except(
      plain.select("row_id", "k", "name")).isEmpty)
    val p = salted.queryExecution.executedPlan.toString
    assert(p.contains("ShuffledHashJoin"), s"expected shuffled-hash join:\n$p")
    assert(!p.contains("BroadcastHashJoin"), "build side must not broadcast")
  }

  test("activityBitmap: masks, popcounts, and shift-AND retention are exact; >1 word fails loud") {
    import org.apache.spark.sql.functions.col
    val day = 86400000L
    // user 1 active days {0,1,2,9}; user 2 active {3} only
    val evs = Seq((1L, 0L), (1L, day), (1L, day + 1), (1L, 2 * day), (1L, 9 * day),
                  (2L, 3 * day))
      .toDF("user_id", "ts_ms")
    val out = graft.operators.Analytics.activityBitmap(evs, "user_id", "ts_ms")
      .collect().map(r => r.getAs[Long]("user_id") ->
        (r.getAs[Long]("mask"), r.getAs[Long]("n_active_days"),
         r.getAs[Long]("ret_days_1"), r.getAs[Long]("ret_days_7"))).toMap
    // user 1: bits {0,1,2,9} -> mask 0b1000000111 = 519; day pairs (0,1),(1,2)
    // at offset 1; (2,9) at offset 7
    assert(out(1L) == ((519L, 4L, 2L, 1L)), s"got ${out(1L)}")
    assert(out(2L) == ((8L, 1L, 0L, 0L)), s"got ${out(2L)}")

    val wide = Seq((1L, 0L), (1L, 70 * day)).toDF("user_id", "ts_ms")
    val ex = intercept[Exception] {
      graft.operators.Analytics.activityBitmap(wide, "user_id", "ts_ms").collect()
    }
    assert(ex.getMessage.contains("day span exceeds"), s"got ${ex.getMessage}")
  }

  test("histogramQuantiles: interpolation is exact on uniform bins; sketch merges by addition") {
    import org.apache.spark.sql.functions.col
    val vals = (0L until 1000L).map(v => ("a", v)).toDF("grp", "v")
    val out = graft.operators.Analytics.histogramQuantiles(
        vals, "grp", col("v"), lo = 0L, width = 100L)
      .collect().map(r => r.getAs[Double]("q") -> r.getAs[Double]("est")).toMap
    // uniform 0..999, width-100 bins: target q*1000 falls in bin q*10 with
    // cumb = 100*floor(10q); est = 100*bin + (q*1000 - cumb) -> exactly q*1000
    assert(out(0.5) == 500.0 && out(0.9) == 900.0 && out(0.99) == 990.0, s"got $out")
    // exact percentile (1+(n-1)q convention) is within one bin width
    assert(math.abs(out(0.5) - 499.5) <= 100.0)

    // mergeability: bin counts from two disjoint halves sum to the full
    // sketch's bins (the property that makes this the streaming path)
    def binCounts(df: org.apache.spark.sql.DataFrame) =
      df.select(col("grp"), (col("v") / 100).cast("long").as("bin"))
        .groupBy("grp", "bin").count()
        .collect().map(r => (r.getString(0), r.getLong(1)) -> r.getLong(2)).toMap
    val full = binCounts(vals)
    val h1 = binCounts(vals.where(col("v") < 500))
    val h2 = binCounts(vals.where(col("v") >= 500))
    val merged = (h1.keySet ++ h2.keySet).map(k =>
      k -> (h1.getOrElse(k, 0L) + h2.getOrElse(k, 0L))).toMap
    assert(merged == full)
  }

  test("holtSmoothing: hand-traced fixed-point recurrence; negative trend floors like the oracle") {
    import spark.implicits._
    // rising series for A, FALLING series for B (negative trend exercises
    // the arithmetic-shift floor semantics that Spark DIV / DuckDB //
    // would both get wrong by truncating toward zero)
    val df = Seq(
      ("A", 0L, 10L), ("A", 1L, 14L), ("A", 2L, 18L),
      ("B", 0L, 100L), ("B", 1L, 60L), ("B", 2L, 20L)
    ).toDF("g", "h", "y")
    val got = graft.operators.Analytics
      .holtSmoothing(df, "g", "h", "y", scaleBits = 20)
      .collect().map(r => r.getAs[String]("g") ->
        (r.getAs[Long]("n_buckets"), r.getAs[Long]("level_fp"),
         r.getAs[Long]("trend_fp"), r.getAs[Long]("forecast_fp"))).toMap
    // driver-side reference with the same integer ops (>> 1 floors)
    def ref(ys: Seq[Long]): (Long, Long) = {
      val q = 1L << 20
      var l = ys.head * q; var b = 0L
      ys.tail.foreach { y =>
        val lNew = (y * q + l + b) >> 1
        b = (lNew - l + b) >> 1
        l = lNew
      }
      (l, b)
    }
    val (la, ba) = ref(Seq(10L, 14L, 18L))
    val (lb, bb) = ref(Seq(100L, 60L, 20L))
    assert(bb < 0L, "test premise: B's trend must be negative")
    assert(got("A") == ((3L, la, ba, la + ba)), s"A: ${got("A")} vs ($la, $ba)")
    assert(got("B") == ((3L, lb, bb, lb + bb)), s"B: ${got("B")} vs ($lb, $bb)")
  }

  test("holtSmoothing: single-bucket series is the level itself, zero trend") {
    import spark.implicits._
    val df = Seq(("A", 5L, 42L)).toDF("g", "h", "y")
    val r = graft.operators.Analytics
      .holtSmoothing(df, "g", "h", "y").collect()(0)
    assert(r.getAs[Long]("level_fp") == 42L << 20)
    assert(r.getAs[Long]("trend_fp") == 0L)
    assert(r.getAs[Long]("n_buckets") == 1L)
  }

  test("winsorizedReport: discrete percentile bounds, exact clamp accounting") {
    import spark.implicits._
    // group A: values 1..100 -> lo = member at floor(99*.01)=0 -> 1,
    // hi = member at floor(99*.99)=98 -> 99; only 100 clips high
    val a = (1L to 100L).map(v => ("A", v))
    // group B: constant values -> nothing clips, sums unchanged
    val b = Seq.fill(5)(("B", 7L))
    val df = (a ++ b).toDF("g", "v")
    val r = graft.operators.Analytics.winsorizedReport(df, "g", "v")
      .collect().map(x => x.getAs[String]("g") -> x).toMap
    val ra = r("A")
    assert(ra.getAs[Long]("lo_c") == 1L && ra.getAs[Long]("hi_c") == 99L)
    assert(ra.getAs[Long]("n_clipped_lo") == 0L &&
           ra.getAs[Long]("n_clipped_hi") == 1L)
    assert(ra.getAs[Long]("sum_raw_c") == 5050L)
    assert(ra.getAs[Long]("sum_winsor_c") == 5049L) // 100 clamped to 99
    val rb = r("B")
    assert(rb.getAs[Long]("lo_c") == 7L && rb.getAs[Long]("hi_c") == 7L)
    assert(rb.getAs[Long]("sum_winsor_c") == 35L &&
           rb.getAs[Long]("n_clipped_lo") == 0L &&
           rb.getAs[Long]("n_clipped_hi") == 0L)
  }

  test("holtBacktest: hand-traced one-step errors for model and naive baseline") {
    // y = [4, 2, 6], Q = 2^20. Trace:
    //  i2: forecast 4Q -> err 2Q; naive |2-4|Q = 2Q; l=3Q, b=-Q/2
    //  i3: forecast 2.5Q -> err 3.5Q; naive |6-2|Q = 4Q
    val q = 1L << 20
    val df = Seq(("A", 1L, 4L), ("A", 2L, 2L), ("A", 3L, 6L))
      .toDF("g", "h", "y")
    val r = Analytics.holtBacktest(df, "g", "h", "y").collect().head
    assert(r.getAs[Long]("n_buckets") == 3L)
    assert(r.getAs[Long]("holt_sae_fp") == 2L * q + 7L * q / 2, s"got $r")
    assert(r.getAs[Long]("naive_sae_fp") == 6L * q, s"got $r")
  }

  test("cusumChangepoints: hand-traced up-alarm with reset; constant series never alarms") {
    val q = 1L << 20
    // y = [4,4,4,12,12]: target = 36q DIV 5 = 7549747, slack = 943718,
    // h = target. S- climbs to 7235175 (no alarm), the step to 12 builds
    // S+ = 4089447 then 8178894 > h at bucket 5 -> one up alarm, reset
    val df = Seq(("A", 1L, 4L), ("A", 2L, 4L), ("A", 3L, 4L),
      ("A", 4L, 12L), ("A", 5L, 12L)).toDF("g", "h", "y")
    val r = graft.operators.Analytics.cusumChangepoints(df, "g", "h", "y")
      .collect().head
    assert(r.getAs[Long]("n_buckets") == 5L)
    assert(r.getAs[Long]("target_fp") == 36L * q / 5L)
    assert(r.getAs[Long]("n_up_alarms") == 1L &&
      r.getAs[Long]("n_down_alarms") == 0L, r.toString)
    assert(r.getAs[Long]("first_alarm_h") == 5L)
    assert(r.getAs[Long]("max_sp_fp") == 8178894L, r.toString)
    assert(r.getAs[Long]("max_sn_fp") == 7235175L, r.toString)
    // a flat series: both accumulators pinned at zero, no alarm, NULL h
    val flat = Seq(("B", 1L, 5L), ("B", 2L, 5L), ("B", 3L, 5L))
      .toDF("g", "h", "y")
    val fr = graft.operators.Analytics.cusumChangepoints(flat, "g", "h", "y")
      .collect().head
    assert(fr.getAs[Long]("n_up_alarms") == 0L &&
      fr.getAs[Long]("n_down_alarms") == 0L &&
      fr.isNullAt(fr.fieldIndex("first_alarm_h")) &&
      fr.getAs[Long]("max_sp_fp") == 0L && fr.getAs[Long]("max_sn_fp") == 0L,
      fr.toString)
  }

  test("cohortLtv: hand-computed sparse triangle — cumulative cents and per-member LTV") {
    val wk = 604800000L
    val ev = Seq(
      (1L, 100L, "purchase", 1000L),
      (1L, 2L * wk + 5L, "purchase", 500L),
      (2L, 200L, "view", 0L),
      (3L, wk + 1L, "purchase", 700L),
      (3L, 2L * wk + 2L, "purchase", 300L))
      .toDF("user_id", "ts_ms", "event_type", "value_cents")
    val out = graft.operators.Analytics.cohortLtv(
        ev, "user_id", "ts_ms", "event_type", "value_cents", "purchase")
      .orderBy("cohort", "age").collect()
      .map(r => (r.getAs[Long]("cohort"), r.getAs[Long]("age")) ->
        (r.getAs[Long]("cohort_size"), r.getAs[Long]("n_buyers"),
         r.getAs[Long]("revenue_cents"), r.getAs[Long]("cum_revenue_cents"),
         r.getAs[Long]("ltv_cents_per_user"))).toMap
    // cohort 0 = {u1, u2} (size 2), cohort 1 = {u3} (size 1);
    // age-1 cell absent for cohort 0 (sparse), cum still exact at age 2
    assert(out == Map(
      (0L, 0L) -> ((2L, 1L, 1000L, 1000L, 500L)),
      (0L, 2L) -> ((2L, 1L, 500L, 1500L, 750L)),
      (1L, 0L) -> ((1L, 1L, 700L, 700L, 700L)),
      (1L, 1L) -> ((1L, 1L, 300L, 1000L, 1000L))), out.toString)
  }

  test("abTestReport: hand-checked midrank U2 against a driver-side reference; invariants hold") {
    import org.apache.spark.sql.catalyst.expressions.XXH64
    // per-user fixture: two converters with revenue, two zero-revenue users
    val ev = Seq(
      (1L, "purchase", 10.00), (1L, "purchase", 5.00),
      (2L, "view", 3.00),
      (3L, "purchase", 10.00),
      (4L, "view", 1.00), (4L, "click", 2.00))
      .toDF("user_id", "event_type", "value")
      .withColumn("value_cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
    val out = graft.operators.Analytics.abTestReport(
        ev, "user_id", "event_type", "value_cents", "purchase")
      .collect().map(r => r.getAs[String]("variant") -> r).toMap

    // independent reference: recompute arms with Spark's XXH64 and U2
    // with sort-based midranks (different code path than the prefix sum)
    val seedC = XXH64.hashLong(5L, 42L)
    def arm(u: Long) = (((XXH64.hashLong(u, seedC) % 2) + 2) % 2)
    val rev = Map(1L -> 1500L, 2L -> 0L, 3L -> 1000L, 4L -> 0L)
    val conv = Map(1L -> 1L, 2L -> 0L, 3L -> 1L, 4L -> 0L)
    val all = rev.values.toSeq
    def mid2(r: Long) = 2L * all.count(_ < r) + all.count(_ == r) + 1L
    for (a <- Seq(0L, 1L)) {
      val users = rev.keys.filter(arm(_) == a).toSeq
      if (users.nonEmpty) {
        val name = if (a == 0L) "A" else "B"
        val row = out(name)
        val n = users.size.toLong
        assert(row.getAs[Long]("n_users") == n)
        assert(row.getAs[Long]("n_conv") == users.map(conv).sum)
        assert(row.getAs[Long]("revenue_cents") == users.map(rev).sum)
        assert(row.getAs[Long]("conv_ppm") == users.map(conv).sum * 1000000L / n)
        assert(row.getAs[Long]("arpu_cents") == users.map(rev).sum / n)
        val u2Ref = users.map(u => mid2(rev(u))).sum - n * (n + 1L)
        assert(row.getAs[Long]("u2") == u2Ref, s"u2 mismatch for arm $name")
      }
    }
    // rank-sum identity on real data: u2_A + u2_B = 2 * n_A * n_B
    val real = spark.read.parquet(sf("events"))
      .withColumn("value_cents",
        (col("value").cast("decimal(18,2)") * 100).cast("long"))
    val rows = graft.operators.Analytics.abTestReport(
        real, "user_id", "event_type", "value_cents", "purchase")
      .collect().map(r => r.getAs[String]("variant") ->
        (r.getAs[Long]("n_users"), r.getAs[Long]("u2"))).toMap
    val (na, ua) = rows("A"); val (nb, ub) = rows("B")
    assert(ua + ub == 2L * na * nb, s"rank-sum identity broken: $rows")
    assert(ua >= 0L && ub >= 0L)
  }

  test("markovStationary: converges to the known distribution; exact on the symmetric chain") {
    // A->B always, B->A / B->B evenly: stationary (1/3, 2/3)
    val t1 = Seq(("A", "B", 10L), ("B", "A", 5L), ("B", "B", 5L))
      .toDF("f", "j", "c")
    val r1 = Analytics.markovStationary(t1, "f", "j", "c", iters = 20)
      .collect().map(x => x.getAs[String]("st") -> x.getAs[Long]("pi")).toMap
    assert(math.abs(r1("A") - 333333333333L) < 1000000L, s"got $r1")
    assert(math.abs(r1("B") - 666666666667L) < 1000000L, s"got $r1")
    // symmetric 2-cycle: uniform is the exact fixed point of the integer
    // iteration (no truncation loss on this fixture)
    val t2 = Seq(("A", "B", 7L), ("B", "A", 3L)).toDF("f", "j", "c")
    val r2 = Analytics.markovStationary(t2, "f", "j", "c", iters = 8)
      .collect().map(x => x.getAs[String]("st") -> x.getAs[Long]("pi")).toMap
    assert(r2 == Map("A" -> 500000000000L, "B" -> 500000000000L), s"got $r2")
  }

  test("rfmScores: fixed-cut scoring, recency scores down, purchase-only cents") {
    val h = 3600000L
    val rows = Seq(
      (1L, 0L * h, "view", 0L), (1L, 100L * h, "purchase", 250L),
      (2L, 60L * h, "purchase", 0L),
      (3L, 90L * h, "view", 0L), (3L, 92L * h, "purchase", 450L),
      (3L, 94L * h, "click", 999L)) // click cents must NOT count
      .toDF("user_id", "ts_ms", "event_type", "value_cents")
    val r = Analytics.rfmScores(rows, "user_id", "ts_ms", "event_type",
        "value_cents", "purchase",
        rHourCuts = Seq(2L, 5L, 8L, 16L), fCuts = Seq(2L, 3L, 4L, 5L),
        mCuts = Seq(100L, 200L, 300L, 400L))
      .collect().map(x => x.getAs[Long]("user_id") ->
        ((x.getAs[Long]("r_hours"), x.getAs[Long]("freq"),
          x.getAs[Long]("cents"), x.getAs[Long]("segment")))).toMap
    // corpus max = 100h (user 1's purchase)
    assert(r == Map(
      1L -> ((0L, 2L, 250L, 523L)),   // r=5, f=2, m=3
      2L -> ((40L, 1L, 0L, 111L)),    // r=1, f=1, m=1
      3L -> ((6L, 3L, 450L, 335L))),  // r=3, f=3, m=5
      s"got $r")
  }

  test("attribution: first/last preceding touch, unattributable dropped, cents exact") {
    // u1: click, view, purchase(1000c)        -> first=click, last=view
    // u2: purchase with no prior touch        -> dropped
    // u3: view, purchase(500c), click, purchase(700c)
    //     -> both first=view; lasts: view then click
    val rows = Seq(
      (1L, 10L, "click", 0L), (1L, 11L, "view", 0L), (1L, 12L, "purchase", 1000L),
      (2L, 20L, "purchase", 999L),
      (3L, 30L, "view", 0L), (3L, 31L, "purchase", 500L),
      (3L, 32L, "click", 0L), (3L, 33L, "purchase", 700L))
      .toDF("user_id", "event_id", "event_type", "value_cents")
      .withColumn("ts_ms", col("event_id") * 1000L)
    val r = Analytics.attribution(rows, "user_id", Seq("ts_ms", "event_id"),
        "event_type", "value_cents", "purchase", Seq("click", "view"))
      .collect().map(x => x.getAs[String]("touch_type") ->
        ((x.getAs[Long]("n_first"), x.getAs[Long]("cents_first"),
          x.getAs[Long]("n_last"), x.getAs[Long]("cents_last")))).toMap
    assert(r == Map(
      "click" -> ((1L, 1000L, 1L, 700L)),
      "view"  -> ((2L, 1200L, 2L, 1500L))), s"got $r")
  }

  test("basketRules: a-priori prune, width cap, exact ppm metrics") {
    // item supports: 10->4, 11->4, 12->3, 13->2, 99->2 (all frequent at
    // minItemSupport=2). Frequent-item widths: basket 1 = 3 and basket 6
    // = 4 exceed the cap (2) -> excluded from PAIR generation; their
    // unary counts still feed n_a/n_b (the documented cap contract).
    val rows = Seq(
      (1L, 10L), (1L, 11L), (1L, 12L),
      (2L, 10L), (2L, 11L),
      (3L, 10L), (3L, 11L),
      (4L, 12L), (4L, 13L),
      (5L, 13L), (5L, 99L),
      (6L, 10L), (6L, 11L), (6L, 12L), (6L, 99L))
      .toDF("bk", "it")
    val r = Analytics.basketRules(rows, "bk", "it",
        minItemSupport = 2L, minPairSupport = 2L, maxBasketItems = 2)
      .collect().map(x => (x.getLong(0), x.getLong(1)) ->
        ((x.getAs[Long]("n_ab"), x.getAs[Long]("support_ppm"),
          x.getAs[Long]("conf_ab_ppm"), x.getAs[Long]("lift_ppm")))).toMap
    // surviving pair baskets: 2,3 -> (10,11) n_ab=2; 4 -> (12,13) and
    // 5 -> (13,99) are single co-occurrences, below minPairSupport.
    // (10,11): support 2*1e6//6=333333, conf_ab 2*1e6//4=500000,
    // lift 500000*6//4=750000
    assert(r == Map((10L, 11L) ->
      ((2L, 333333L, 500000L, 750000L))), s"got $r")
  }

  test("basketRules: n_ab never exceeds min(n_a, n_b); order deterministic") {
    val docs = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    val r = Analytics.basketRules(docs, "l_orderkey", "l_partkey",
      minItemSupport = 2L, minPairSupport = 1L, topN = 50).collect()
    assert(r.nonEmpty)
    r.foreach { x =>
      assert(x.getAs[Long]("n_ab") <= math.min(
        x.getAs[Long]("n_a"), x.getAs[Long]("n_b")))
      assert(x.getAs[Long]("item_a") < x.getAs[Long]("item_b"))
    }
    val again = Analytics.basketRules(docs.repartition(7), "l_orderkey",
      "l_partkey", minItemSupport = 2L, minPairSupport = 1L, topN = 50)
      .collect()
    assert(r.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq,
      "basketRules depends on input partitioning")
  }
}
