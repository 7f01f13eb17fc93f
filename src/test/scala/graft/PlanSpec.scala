package graft

/** Plan-shape regression tests: the properties that make these queries
  * survive a 100 TB scale-up, asserted on the optimized physical plan so a
  * refactor cannot silently regress them (SURVEY.md §4 / README "Designed
  * for 100 TB"). */
class PlanSpec extends SparkSpec {

  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
      .queryExecution.executedPlan.toString

  test("q1_agg: partial aggregation before the shuffle, pruned scan") {
    val p = plan("q1_agg")
    assert(p.contains("partial_sum"), "map-side combine missing")
    // only the 5 needed columns reach the scan (toString truncates
    // ReadSchema, so match the FileScan projection list)
    val scanRe = ("""FileScan parquet \[l_quantity#\d+,l_extendedprice#\d+,""" +
      """l_discount#\d+,l_returnflag#\d+,l_linestatus#\d+\]""").r
    assert(scanRe.findFirstIn(p).isDefined, "scan reads more than the 5 needed columns")
  }

  test("q3/q5: dimension joins broadcast; no sort-merge join at this shape") {
    Seq("q3_topk", "q5_join").foreach { q =>
      val p = plan(q)
      assert(p.contains("BroadcastHashJoin"), s"$q lost its broadcast join")
      assert(!p.contains("SortMergeJoin"), s"$q fell back to sort-merge")
    }
  }

  test("q3_topk: top-k via TakeOrderedAndProject, not a global sort") {
    assert(plan("q3_topk").contains("TakeOrderedAndProject"))
  }

  test("sim_topk: per-partition top-k before the exchange (WindowGroupLimit)") {
    assert(plan("sim_topk").contains("WindowGroupLimit"))
  }

  test("pipe_transform: filter pushdown reaches the parquet scan") {
    val p = plan("pipe_transform")
    assert(p.contains("PushedFilters: [IsNotNull(props)]"))
  }

  test("q_semi_anti: semi/anti joins planned as joins, not subquery scans") {
    val p = plan("q_semi_anti")
    assert(p.contains("LeftSemi") && p.contains("LeftAnti"))
  }

  test("dedup_embedding gate config: LSH-blocked equi-join, no nested-loop product") {
    val p = plan("dedup_embedding")
    assert(!p.contains("CartesianProduct"),
      "blocked path must not plan a cartesian product")
    // the only nested-loop join allowed is none at all — candidate
    // generation is an equi-join on the bucket key
    assert(!p.contains("BroadcastNestedLoopJoin"),
      "blocked path must not plan a nested-loop join")
  }

  test("text_quality_filter: one native keep-predicate, no per-field re-evaluation") {
    val p = plan("text_quality_filter")
    assert(p.contains("quality_lang_keep"),
      "filter must use the single-evaluation native predicate")
    // the old Column composition left ~10 normalization subtrees in the
    // Filter (FilterExec does no subexpression elimination)
    assert(!p.contains("regexp_replace"),
      "no regex normalization should remain in the filter plan")
  }

  test("minhash capped bucket join: equi-join candidates, no cartesian") {
    Seq("dedup_minhash", "dedup_minhash_verified").foreach { q =>
      val p = plan(q)
      assert(!p.contains("CartesianProduct"), s"$q planned a cartesian product")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q planned a nested-loop join")
    }
  }
}
