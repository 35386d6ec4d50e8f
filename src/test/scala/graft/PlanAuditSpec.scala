package graft

import org.apache.spark.sql.functions._

/** Plan regression guards: the scale properties §5 claims must stay true
  * as operators evolve — pushdown reaching the scan, pruned read
  * schemas, dims broadcast, facts never broadcast. */
class PlanAuditSpec extends SparkSpec {
  private def plan(name: String): String =
    SparkEntry.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q6 pushes every predicate into the parquet scan") {
    val p = plan("q6_filter_agg")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), IsNotNull(l_discount), IsNotNull(l_quantity)")
      || p.contains("GreaterThanOrEqual(l_shipdate"), s"missing pushdown:\n$p")
    // projection pruned to the 4 needed columns
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_discount:double,l_shipdate:timestamp_ntz>"),
      s"unpruned read schema:\n$p")
  }

  test("q1 reads only the aggregation columns") {
    val p = plan("q1_pricing")
    assert(!p.contains("l_orderkey"), "q1 must not read join keys it doesn't use")
    assert(p.contains("l_returnflag") && p.contains("l_quantity"))
  }

  test("q5 broadcasts dimensions, never the lineitem fact") {
    val p = plan("q5_region_revenue")
    assert(p.contains("BroadcastHashJoin"), p)
    // the lineitem scan must be on the streamed (left) side of the first join:
    // no BroadcastExchange subtree may contain the lineitem file scan
    val broadcastSubtrees = p.split("BroadcastExchange").drop(1)
    assert(!broadcastSubtrees.exists(_.split("\n").take(4).mkString.contains("lineitem")),
      s"lineitem must not be broadcast:\n$p")
  }

  test("dedup ngram plan contains no cartesian or nested-loop join") {
    val p = plan("dedup_ngram_jaccard")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("window queries partition by entity (no global sort of the fact)") {
    val p = plan("feat_rolling_agg")
    assert(p.contains("user_id"), p)
  }

  test("dedup clusters plan has no cartesian product in any iteration") {
    val p = plan("dedup_clusters")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("contamination broadcasts the benchmark shingles, streams the corpus") {
    val p = plan("text_contamination")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q1 runs on long sums: no decimal cast anywhere in the plan") {
    // the integer-cents form exists to kill the per-row double->BigDecimal
    // cast; a decimal type reappearing in the plan is the regression
    val p = plan("q1_pricing")
    assert(!p.toLowerCase.contains("decimal"), s"decimal crept back into q1:\n$p")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"), p)
  }

  test("text ops tokenize once: a single split() per document scan") {
    for (q <- Seq("text_langid", "text_quality", "text_stats")) {
      val p = plan(q)
      val splits = "split\\(text".r.findAllIn(p).length
      assert(splits <= 1, s"$q re-tokenizes ($splits split calls):\n$p")
    }
  }

  test("text_redact evaluates the regex chain once") {
    val p = plan("text_redact")
    val regexes = "regexp_replace".r.findAllIn(p).length
    // two nested replaces (email, number), each exactly once
    assert(regexes <= 2, s"redact chain duplicated ($regexes regexp_replace):\n$p")
  }

  test("q4 EXISTS plans as a left-semi hash join, not an aggregate") {
    val p = plan("q4_priority_exists")
    assert(p.contains("LeftSemi"), s"expected semi join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q19's quantity envelope pushes to the lineitem scan under the disjunction") {
    val p = plan("q19_disjunct")
    assert(p.contains("GreaterThanOrEqual(l_quantity") ||
           p.contains("PushedFilters: [IsNotNull(l_quantity)"),
      s"quantity envelope not pushed:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"part dim should broadcast:\n$p")
  }

  test("q7 broadcasts both nation roles, never the facts") {
    val p = plan("q7_volume")
    assert(p.contains("BroadcastHashJoin"), p)
    val broadcastSubtrees = p.split("BroadcastExchange").drop(1)
    assert(!broadcastSubtrees.exists(_.split("\n").take(4).mkString.contains("lineitem")),
      s"lineitem must not be broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q13 aggregates orders before the outer join (agg-then-join shape)") {
    val p = plan("q13_distribution")
    assert(p.contains("LeftOuter"), s"expected outer join:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    // the per-custkey count must sit BELOW the outer join: the orders-side
    // aggregate appears before (deeper than) the join operator in the tree
    val joinIdx = p.indexOf("LeftOuter")
    assert(p.indexOf("o_custkey", joinIdx) >= 0, s"orders agg not below the join:\n$p")
  }

  test("q15's scalar max joins broadcast, revenue compared as longs") {
    val p = plan("q15_top_supplier")
    assert(p.contains("BroadcastHashJoin"), s"max side should broadcast:\n$p")
    assert(!p.toLowerCase.contains("decimal"), s"cents comparison must stay on longs:\n$p")
  }

  test("q17 broadcasts the filtered part keys; only the brand slice shuffles") {
    val p = plan("q17_avg_qty")
    assert(p.contains("BroadcastHashJoin"), s"part keys should broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q22 plans the anti-join and a single 1-row scalar broadcast") {
    val p = plan("q22_global_acct")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    // the global-average scalar is the ONLY nested-loop join (1-row side)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$p")
  }

  test("quality_gopher tokenizes once per document scan") {
    val p = plan("quality_gopher")
    val splits = "split\\(text".r.findAllIn(p).length
    assert(splits <= 1, s"quality_gopher re-tokenizes ($splits split calls):\n$p")
  }

  test("text_ngram_topk takes top-k without a global sort of the gram counts") {
    val p = plan("text_ngram_topk")
    assert(p.contains("TakeOrderedAndProject"), s"expected partial top-k:\n$p")
  }

  test("event_funnel is two aggregates, no window and no join") {
    val p = plan("event_funnel")
    assert(!p.contains("Window"), s"funnel must not use a window:\n$p")
    assert(!p.contains("Join"), s"funnel must not join:\n$p")
  }

  test("user_retention_1d self-join stays keyed (no cartesian)") {
    val p = plan("user_retention_1d")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("attrib_views_7d plans a keyed equi-join, never a per-user nested loop") {
    // the bucket-by-window-length rewrite exists so the range predicate
    // rides an equi-join on (user_id, week_bucket) as a residual filter
    val p = plan("attrib_views_7d")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join degenerated to a nested loop:\n$p")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
      || p.contains("BroadcastHashJoin"), s"expected a hash/merge equi-join:\n$p")
  }

  test("q21 plans keyed semi/anti correlations, never a nested loop over lineitem") {
    // at test SF the lineitem self-correlation legs fit a broadcast, so
    // size-based broadcast is disabled to audit the at-scale shape: both
    // correlations must stay KEYED (shuffle) joins on l_orderkey with the
    // suppkey/shipdate comparisons as in-group residuals. The supplier
    // broadcast() HINT must survive the disabled threshold.
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val old = spark.conf.get(key)
    spark.conf.set(key, "-1")
    try {
      val p = plan("q21_wait_sole")
      assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
        s"self-correlation degenerated to a nested loop:\n$p")
      assert(p.contains("LeftSemi"), s"expected semi join for EXISTS:\n$p")
      assert(p.contains("LeftAnti"), s"expected anti join for NOT EXISTS:\n$p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"),
        s"correlations must shuffle on l_orderkey at scale:\n$p")
      assert(p.contains("BroadcastHashJoin"), s"supplier hint should broadcast:\n$p")
    } finally spark.conf.set(key, old)
  }

  test("rank queries contain no single-partition window exchange") {
    // a Window with empty partitionBy plans Exchange SinglePartition —
    // the whole input through one task; RankOps must keep these out
    for (q <- Seq("text_length_rank", "supplier_rank")) {
      val p = plan(q)
      assert(!p.contains("Exchange SinglePartition"), s"$q has a global window:\n$p")
    }
  }

  test("text_chunk is a narrow plan: no hash shuffle, no join, no window") {
    // tokenize → explode an index sequence → slice: per-row fan-out only.
    // The sole exchange allowed is the presentation sort's range partition.
    val p = plan("text_chunk")
    assert(p.contains("Generate explode"), s"chunk fan-out must be an explode:\n$p")
    assert(!p.contains("Exchange hashpartitioning"), s"chunking must not shuffle:\n$p")
    assert(!p.contains("Join") && !p.contains("Window"), s"chunking needs no join/window:\n$p")
  }

  test("shard_pack's prefix sum stays partitioned (no single-partition window)") {
    // the cumulative token count is RankOps.exclusivePrefixSum — range
    // repartition + per-partition windows + broadcast offsets; the
    // global-window form it replaces would plan Exchange SinglePartition
    val p = plan("shard_pack")
    assert(!p.contains("Exchange SinglePartition"), s"shard_pack has a global window:\n$p")
    assert(p.contains("BroadcastHashJoin"), s"partition offsets must broadcast:\n$p")
  }

  test("sample_fixed_k's window stays keyed by source (no single-partition exchange)") {
    // the per-group top-k must shuffle by the group key only — a global
    // priority sort would single-partition the corpus
    val p = plan("sample_fixed_k")
    assert(p.contains("Window"), s"fixed-k sample should plan a keyed window:\n$p")
    assert(!p.contains("Exchange SinglePartition"), s"global window in fixed-k:\n$p")
    // and rnk <= k must push down as WindowGroupLimit: each task keeps
    // only k rows per group BEFORE the group shuffle/sort, so one giant
    // domain costs k rows per map task, not a corpus/2-row sort — the
    // skew mitigation that makes the keyed window safe at 100 TB
    assert(p.contains("WindowGroupLimit"),
      s"rnk<=k did not push down as WindowGroupLimit:\n$p")
  }

  test("vocab_stats pre-aggregates (source, token) below the shuffle, no window/join") {
    // the distinct-vocabulary count must collapse repeated tokens
    // map-side: the shuffle carries vocabulary rows, not the exploded
    // token stream
    val p = plan("vocab_stats")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val partialIdx = p.lastIndexOf("HashAggregate")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"no partial aggregate below the vocab shuffle:\n$p")
    assert(!p.contains("Window") && !p.contains("Join"), p)
    assert(!p.contains("Exchange SinglePartition"), p)
  }

  test("emb_centroid partial-aggregates below the label/pos shuffle") {
    // posexplode fans the corpus out dim× — the per-(label,pos) sum must
    // combine map-side so the shuffle carries (labels × dims) rows/task,
    // not the exploded corpus
    val p = plan("emb_centroid")
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val partialIdx = p.lastIndexOf("HashAggregate")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"no partial aggregate below the shuffle:\n$p")
    assert(!p.contains("Window"), p)
  }

  test("skip_scan's pruned read still pushes the predicate into the scan") {
    // file-level skipping is a SUPERSET plan-time prune; the real
    // predicate must still reach the surviving files' row groups —
    // explicit-file-list reads must not lose pushdown
    val p = plan("skip_scan")
    assert(p.contains("PushedFilters") &&
      p.contains("GreaterThanOrEqual(l_quantity,45.0)"),
      s"predicate not pushed into the pruned scan:\n$p")
    assert(p.contains("ReadSchema: struct<l_quantity:double,l_extendedprice:double,l_returnflag:string>"),
      s"unpruned read schema:\n$p")
  }

  test("feat_quantile_bin never globally sorts or buffers the spend frame") {
    // cuts come from the count-banded percentileDisc jobs (separate
    // actions); the RESULT plan is one keyed aggregate + a projection —
    // no percentile_disc buffering aggregate, no Window
    val p = plan("feat_quantile_bin")
    assert(!p.contains("percentile_disc"), p)
    assert(!p.contains("Window"), p)
  }

  test("q8 broadcasts nation/region, never the lineitem fact; no cartesian") {
    val p = plan("q8_market_share")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val broadcastSubtrees = p.split("BroadcastExchange").drop(1)
    assert(!broadcastSubtrees.exists(_.split("\n").take(4).mkString.contains("lineitem")),
      s"lineitem must not be broadcast:\n$p")
    // the p_type and date predicates reach the scans
    assert(p.contains("EqualTo(p_type,ECONOMY)") || p.contains("p_type"), p)
  }

  test("cohort_retention joins keyed on user (no cartesian, no window)") {
    val p = plan("cohort_retention")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("Window"), p)
  }

  test("q2 broadcasts parts and region suppliers onto the derived supply relation") {
    val p = plan("q2_min_cost")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val broadcastSubtrees = p.split("BroadcastExchange").drop(1)
    assert(!broadcastSubtrees.exists(_.split("\n").take(4).mkString.contains("lineitem")),
      s"lineitem must not be broadcast:\n$p")
  }

  test("q2's min-cost self-join reuses the supply exchange (one fact scan at runtime)") {
    // `target` feeds both the per-part MIN and the equality join back;
    // AQE's stage cache must dedup the identical ps shuffle subtree or
    // the self-join silently doubles the lineitem scan. Runtime reuse is
    // only visible in the POST-EXECUTION adaptive plan, so execute first.
    val df = SparkEntry.queries("q2_min_cost")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert("""ReusedExchange.*hashpartitioning\(l_partkey""".r
        .findFirstIn(p).isDefined,
      s"ps shuffle not reused — the q2 self-join is scanning lineitem twice:\n$p")
  }

  test("q9 profit stays on long arithmetic with dims broadcast") {
    val p = plan("q9_profit")
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.toLowerCase.contains("decimal"),
      s"profit must stay integer, decimal crept in:\n$p")
    val broadcastSubtrees = p.split("BroadcastExchange").drop(1)
    assert(!broadcastSubtrees.exists(_.split("\n").take(4).mkString.contains("lineitem")),
      s"lineitem must not be broadcast:\n$p")
  }

  test("q11's only nested-loop is the 1-row global-total broadcast") {
    val p = plan("q11_important")
    assert(!p.contains("CartesianProduct"), p)
    val bnlj = "BroadcastNestedLoopJoin".r.findAllIn(p).length
    assert(bnlj <= 1, s"unexpected nested-loop joins ($bnlj):\n$p")
    // per-part value combines map-side below its shuffle
    val exchangeIdx = p.indexOf("Exchange hashpartitioning")
    val partialIdx = p.lastIndexOf("HashAggregate")
    assert(exchangeIdx >= 0 && partialIdx > exchangeIdx,
      s"no partial aggregate below the value shuffle:\n$p")
  }

  test("q16 anti-joins the exclusion list and broadcasts both dims") {
    val p = plan("q16_supplier_cnt")
    assert(p.contains("LeftAnti"), s"expected anti join:\n$p")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q20's exists-chain plans as semi joins; facts never broadcast") {
    val p = plan("q20_dominant")
    assert(p.contains("LeftSemi"), s"expected semi joins for the chain:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    val broadcastSubtrees = p.split("BroadcastExchange").drop(1)
    assert(!broadcastSubtrees.exists(_.split("\n").take(4).mkString.contains("lineitem")),
      s"lineitem must not be broadcast:\n$p")
  }

  test("golden_records mode pass pre-aggregates below its entity join") {
    val p = plan("golden_records")
    assert(!p.contains("Window"), "survivorship must stay combinable, " +
      s"never a window:\n$p")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
  }
}
