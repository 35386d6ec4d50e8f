package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B34: graph centrality over relationship edges — PageRank as the
  * entity-importance verb (the domain-quality signal of the published
  * web-curation stacks, and the "which supplier/customer anchors this
  * network" analytics question on the warehouse side).
  *
  * Exactness: ranks are SCALED LONGS (default 10⁹ = rank 1.0) and every
  * update is integer arithmetic — contribution = (r·d) div (100·outdeg)
  * with floor division, teleport = floor(scale·(100−d)/100) — so
  * iteration sums are order-independent and the result is bit-identical
  * in any engine (gated; a float PageRank's accumulation order would
  * drift). Floor-truncation loses ≤ 1 unit (1e-9 rank) per in-edge per
  * iteration — quantization, not nondeterminism.
  *
  * Semantics (pinned): the simple damped model WITHOUT dangling-mass
  * redistribution — a sink node's mass evaporates (the common
  * simplification; total mass is then monotonically non-increasing,
  * spec-asserted). Self-loops count like any edge; duplicate edges
  * collapse (DISTINCT) before degrees.
  *
  * Scale: Pregel-as-joins, the DedupClusters discipline — per iteration
  * ONE edge-keyed join (ranks onto out-edges), one dst-keyed partial
  * aggregation, one nodes-sized left join; edges+degrees and the node
  * set are anchored ONCE (eager — the SemDedup contract) and reused
  * every iteration, ranks anchor per iteration so lineage stays flat.
  * The [[Anchor]] parameter picks the failure story: Local
  * (executor-resident, the local-mode default) or Reliable(dir)
  * (survives executor loss — what a 100 TB multi-iteration run on a
  * real cluster must use; results are bit-identical, spec-pinned).
  * No step is ever all-pairs; iterations cost O(E) shuffle each,
  * exactly GraphX's PageRank shape without leaving DataFrames.
  */
object GraphOps {

  /** Explicit width for the pre-anchor edge repartitions below: an
    * AQE-coalescible keyed repartition collapses small-at-test-scale
    * edge frames back to a handful of partitions, re-serializing the
    * per-iteration work the repartition exists to spread. */
  private def npart(df: DataFrame): Int =
    math.max(1, df.sparkSession.sparkContext.defaultParallelism)

  /** Rank-frame lineage truncation cadence for the PageRank loops
    * (r19). The edge/degree and node frames are eager anchors (leaves),
    * so an UN-anchored round adds one join + one aggregation over those
    * leaves to the growing plan — cheap until analysis cost compounds.
    * Anchoring each round, by contrast, costs a blocking job plus a
    * V-sized checkpoint copy per iteration. Every [[AnchorEvery]]
    * rounds bounds plan depth for long runs while short (gate-sized)
    * runs fuse into one query. Bit-identical either way (the Anchor
    * contract). */
  private val AnchorEvery = 7

  /** Exact integer PageRank. `edges`: first two columns are (src, dst).
    * Returns (id, rank) with rank in `scale` units. */
  def pagerank(edges: DataFrame, iters: Int = 3, dampingPct: Int = 85,
               scale: Long = 1000000000L,
               anchor: Anchor = Anchor.Local,
               edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampingPct >= 1 && dampingPct <= 99, s"dampingPct=$dampingPct")
    val Seq(s, t) = edges.columns.take(2).toSeq
    // anchored: degrees, the degree-join and the node set all read
    // e — without it the caller's edge derivation re-runs three times.
    // Partitioned by src BEFORE the anchor (r18, guide §2.4): the
    // src-hash layout satisfies the clustering of the distinct, the
    // degree aggregation, the degree join AND every iteration's rank
    // join, so the O(E) frame crosses the network ONCE and is never
    // re-exchanged or sorted per iteration (the checkpoint preserves
    // the partitioning). Skew note: a hub node's out-edges were
    // already co-located by the per-src rank join in the previous
    // shape — this adds no new hot spot.
    // `edgesDistinct = true` is the caller's PROOF the edge frame is
    // already duplicate-free (duplicates would inflate outdeg and
    // corrupt the exact ranks) — it skips the dedup aggregation
    // outright (guide §2.4 "a distinct on data that is already
    // unique"), one full hash-agg pass over E saved at any scale.
    val eraw = edges.select(col(s).cast("long").as("src"),
      col(t).cast("long").as("dst")).repartition(npart(edges), col("src"))
    val eplan = if (edgesDistinct) eraw else eraw.distinct()
    // ONE anchored E-sized frame (r19): out-degrees ride a
    // src-partitioned WINDOW over the already-src-keyed exchange —
    // identical rows to the former e ⋈ deg shape, but that shape
    // anchored e, re-read the checkpoint twice (degree aggregation +
    // join stream) and anchored the joined result AGAIN (profiled:
    // the two E-sized anchor stores and the double checkpoint read
    // were the gate's hottest stages). The window pays one
    // in-partition sort of E instead.
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val ed = anchor(eplan.withColumn("outdeg", count(lit(1)).over(wSrc)))
    // node set in ONE pass over the anchored edges (r19): the former
    // src∪dst union scanned the checkpoint twice — profiled as the
    // single most expensive stage of the gate (~190 MiB of block reads
    // + two partial-distinct passes); explode emits both endpoints per
    // edge in one read (guide §2.3: half the bytes into the same
    // exchange).
    val nodes = anchor(ed.select(explode(array(col("src"), col("dst")))
      .as("id")).distinct())
    val teleport = scale * (100L - dampingPct) / 100L
    // "pr" internally: `rank` inside expr() would parse as the window
    // function and demand an OVER clause.
    // Rank frames anchor only every [[AnchorEvery]] rounds (r19): with
    // ed and nodes already materialized LEAVES, the chain of rounds in
    // between fuses into the consumer's single query — each round is
    // one contrib exchange, with no blocking job and no V-sized store
    // per round. Anchoring every round cost one eager job + checkpoint
    // copy per iteration and bought nothing until plan depth grows.
    var r = nodes.withColumn("pr", lit(scale))
    for (i <- 1 to iters) {
      val contrib = ed.join(r.hint("shuffle_hash"), ed("src") === r("id"))
        .select(col("dst"),
          expr(s"(pr * $dampingPct) div (100 * outdeg)").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      val rNew = nodes.join(contrib.hint("shuffle_hash"),
          nodes("id") === contrib("dst"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("m"), lit(0L)))
          .as("pr"))
      r = if (i % AnchorEvery == 0 && i < iters) anchor(rNew) else rNew
    }
    r.select(col("id"), col("pr").as("rank"))
  }

  /** Personalized PageRank: random-walk-with-restart importance
    * RELATIVE TO A SEED SET — the "related entities" ranking a global
    * PageRank cannot answer (global rank scores hubness; PPR scores
    * proximity to the seeds). Same exact integer convention as
    * [[pagerank]]: seeds start at `scale` and receive the teleport
    * mass every iteration; non-seeds start at 0 and receive only
    * walked-in mass, so after k iterations exactly the ≤ k-hop
    * out-neighborhood of the seeds is nonzero (the khop frontier law,
    * spec-asserted). Seeds absent from the edge set still rank (they
    * hold their own teleport mass) — the khop dist-0 convention.
    * Dangling mass evaporates, matching [[pagerank]]. */
  def personalizedPagerank(edges: DataFrame, seeds: DataFrame,
      iters: Int = 3, dampingPct: Int = 85, scale: Long = 1000000000L,
      anchor: Anchor = Anchor.Local,
      edgesDistinct: Boolean = false): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampingPct >= 1 && dampingPct <= 99, s"dampingPct=$dampingPct")
    val Seq(s, t) = edges.columns.take(2).toSeq
    // one anchored E-sized frame (windowed out-degrees) + caller-proved
    // distinct skip: see [[pagerank]] (r18/r19)
    val eraw = edges.select(col(s).cast("long").as("src"),
      col(t).cast("long").as("dst")).repartition(npart(edges), col("src"))
    val eplan = if (edgesDistinct) eraw else eraw.distinct()
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val ed = anchor(eplan.withColumn("outdeg", count(lit(1)).over(wSrc)))
    val sd = seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct()
    // single-pass endpoint explode: see [[pagerank]] (r19)
    val nodes = anchor(ed.select(explode(array(col("src"), col("dst")))
      .as("id")).union(sd).distinct()
      .join(sd.withColumn("_s", lit(true)), Seq("id"), "left")
      .select(col("id"), coalesce(col("_s"), lit(false)).as("is_seed")))
    val teleport = scale * (100L - dampingPct) / 100L
    var r = nodes.select(col("id"),
      when(col("is_seed"), lit(scale)).otherwise(lit(0L)).as("pr"))
    for (i <- 1 to iters) {
      val contrib = ed.join(r.hint("shuffle_hash"), ed("src") === r("id"))
        .select(col("dst"),
          expr(s"(pr * $dampingPct) div (100 * outdeg)").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      val rNew = nodes.join(contrib.hint("shuffle_hash"),
          nodes("id") === contrib("dst"), "left")
        .select(col("id"),
          (when(col("is_seed"), lit(teleport)).otherwise(lit(0L)) +
            coalesce(col("m"), lit(0L))).as("pr"))
      // see [[pagerank]]: anchor only every AnchorEvery rounds
      r = if (i % AnchorEvery == 0 && i < iters) anchor(rNew) else rNew
    }
    r.select(col("id"), col("pr").as("rank"))
  }

  /** Weighted exact integer PageRank: edges carry a positive integer
    * weight (trade volume, co-occurrence count) and a node's mass
    * splits across out-edges PROPORTIONALLY to weight. Contribution
    * chain, pinned: `t = (pr·d) div 100`, then `m = (t·w) div outw` —
    * two floor divisions mirrored div-for-div in the oracle SQL.
    * Uniform weights reduce EXACTLY to [[pagerank]] (floor-div
    * composition: floor(floor(x/m)/n) = floor(x/(m·n)), so
    * (t·1) div outdeg ≡ (pr·d) div (100·outdeg) — spec-asserted
    * bitwise). Parallel (src,dst) duplicates merge ADDITIVELY before
    * degrees (pinned; B34 collapses duplicates instead — a weighted
    * edge list's multiplicity IS signal). Overflow headroom: t·w must
    * stay under 2⁶³ — with default scale, t ≤ total-mass·0.85 ≤
    * n·8.5e8, so per-edge weights up to ~10⁶ are safe at 10⁶ nodes;
    * ANSI mode makes any breach loud, never silent. */
  def pagerankWeighted(edges: DataFrame, iters: Int = 3,
      dampingPct: Int = 85, scale: Long = 1000000000L,
      anchor: Anchor = Anchor.Local): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampingPct >= 1 && dampingPct <= 99, s"dampingPct=$dampingPct")
    val Seq(s, t, w) = edges.columns.take(3).toSeq
    // one anchored E-sized frame: out-weights ride a src-partitioned
    // window over the additive-merge aggregation — see [[pagerank]]
    // (r18/r19; same fold, sum instead of count)
    val eplan = edges.select(col(s).cast("long").as("src"),
        col(t).cast("long").as("dst"), col(w).cast("long").as("w"))
      .withColumn("w", when(col("w").isNull || col("w") <= 0, raise_error(
        concat(lit("pagerankWeighted: null or non-positive weight on edge "),
          col("src").cast("string"), lit("->"), col("dst").cast("string"))))
        .otherwise(col("w")))
      .repartition(npart(edges), col("src"))
      .groupBy(col("src"), col("dst")).agg(sum(col("w")).as("w"))
    val wSrc = org.apache.spark.sql.expressions.Window
      .partitionBy(col("src"))
    val ed = anchor(eplan.withColumn("outw", sum(col("w")).over(wSrc)))
    // single-pass endpoint explode: see [[pagerank]] (r19)
    val nodes = anchor(ed.select(explode(array(col("src"), col("dst")))
      .as("id")).distinct())
    val teleport = scale * (100L - dampingPct) / 100L
    var r = nodes.withColumn("pr", lit(scale))
    for (i <- 1 to iters) {
      val contrib = ed.join(r.hint("shuffle_hash"), ed("src") === r("id"))
        .select(col("dst"),
          expr(s"(((pr * $dampingPct) div 100) * w) div outw").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      val rNew = nodes.join(contrib.hint("shuffle_hash"),
          nodes("id") === contrib("dst"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("m"), lit(0L)))
          .as("pr"))
      // see [[pagerank]]: anchor only every AnchorEvery rounds
      r = if (i % AnchorEvery == 0 && i < iters) anchor(rNew) else rNew
    }
    r.select(col("id"), col("pr").as("rank"))
  }

  /** In/out degree per node — the cheap companion statistic. */
  def degrees(edges: DataFrame): DataFrame = {
    val Seq(s, t) = edges.columns.take(2).toSeq
    val e = edges.select(col(s).cast("long").as("src"),
      col(t).cast("long").as("dst")).distinct()
    e.groupBy(col("src").as("id")).agg(count(lit(1)).as("out_deg"))
      .join(e.groupBy(col("dst").as("id")).agg(count(lit(1)).as("in_deg")),
        Seq("id"), "full")
      .select(col("id"), coalesce(col("out_deg"), lit(0L)).as("out_deg"),
        coalesce(col("in_deg"), lit(0L)).as("in_deg"))
  }

  /** Global triangle census by degree-ordered orientation — the
    * clustering-structure statistic (how cliquish is the co-purchase /
    * co-occurrence graph). Each undirected edge orients from the
    * (degree, id)-SMALLER endpoint to the larger; the orientation is a
    * total order, so every triangle is counted exactly once at its
    * minimum vertex, and wedge enumeration is Σ outdeg² with
    * outdeg = O(√m) — the textbook O(m^1.5) bound, the exact-count
    * optimum (no per-node hot spot survives orientation). Self-loops
    * drop; duplicate/reversed edges collapse. Output (1 row):
    * (n_nodes, n_edges, n_wedges, n_triangles) with wedges = Σ C(d,2)
    * over UNDIRECTED degrees. */
  def triangleCount(edges: DataFrame): DataFrame = {
    val Seq(s, t) = edges.columns.take(2).toSeq
    // checkpointed: und feeds degrees, orientation AND the edge count —
    // without it an expensive upstream edge derivation re-runs three
    // times (measured 102 s → 2.8 s at 50× on the co-purchase graph)
    val und = edges.select(col(s).cast("long").as("x"), col(t).cast("long").as("y"))
      .filter(col("x") =!= col("y"))
      .select(least(col("x"), col("y")).as("a"),
        greatest(col("x"), col("y")).as("b"))
      .distinct()
      .localCheckpoint()
    // single-pass endpoint explode (r19): one read of the checkpointed
    // edge set instead of two union branches — see [[pagerank]].
    // Anchored: deg feeds BOTH orientation attaches AND the wedge
    // statistics — un-anchored, the degree aggregation ran three times.
    val deg = und.select(explode(array(col("a"), col("b"))).as("id"))
      .groupBy(col("id")).agg(count(lit(1)).as("d"))
      .localCheckpoint()
    val o = und
      .join(deg.select(col("id").as("a"), col("d").as("da")), Seq("a"))
      .join(deg.select(col("id").as("b"), col("d").as("db")), Seq("b"))
      .select(
        when(col("da") < col("db") ||
            (col("da") === col("db") && col("a") < col("b")),
          struct(col("a").as("src"), col("b").as("dst")))
          .otherwise(struct(col("b").as("src"), col("a").as("dst")))
          .as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
      .repartition(npart(edges), col("src"))
      .localCheckpoint()
    // adjacency-intersection census (r18, guide §2.3 "shuffle fewer
    // bytes"): the former wedge self-join MATERIALIZED Σ outdeg² wedge
    // rows and shuffled them into the closing-edge join; grouping the
    // oriented neighbors once and intersecting the two endpoint lists
    // per edge counts the identical (wedge, closing-edge) matches —
    // Σ_{(u,v)∈E} |N⁺(u) ∩ N⁺(v)| — while the shuffles carry only
    // O(E) rows (edges + one adjacency array per node). Per-row cost
    // stays O(outdeg), bounded by the orientation's O(√m). `o` is
    // src-partitioned so the grouping and the u-side attach reuse one
    // exchange.
    // anchored (r19): adj feeds BOTH endpoint attaches — un-anchored,
    // the neighbor-array aggregation over E ran twice (once per join
    // side; the u-side is co-partitioned with o, the v-side pays its
    // one dst-keyed exchange either way)
    val adj = o.groupBy(col("src")).agg(collect_list(col("dst")).as("ns"))
      .localCheckpoint()
    val tri = o
      .join(adj.select(col("src").as("u"), col("ns").as("nu")),
        col("src") === col("u"))
      .join(adj.select(col("src").as("v"), col("ns").as("nv")),
        col("dst") === col("v"))
      .select(size(array_intersect(col("nu"), col("nv"))).as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("n_triangles"))
    // integer floor-div, NOT double /2-then-cast: the sum is even by
    // construction so div is exact at any scale, where the double path
    // would silently round past 2^53 (ANSI overflow past 2^63 is loud)
    val stats = deg.agg(count(lit(1)).as("n_nodes"),
      expr("sum(d * (d - 1)) div 2").cast("long").as("n_wedges"))
      .crossJoin(und.agg(count(lit(1)).as("n_edges")))
    stats.crossJoin(tri) // 1-row × 1-row
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"))
  }

  // ---------------------------------------------------------------- gate

  /** The bidirectional customer↔supplier trade edge set shared by the
    * pagerank / ppr / khop gates. The distinct (cust, supp) derivation
    * is anchored BEFORE the direction union (r18): the union's two
    * branches are separate subtrees to Catalyst, so the un-anchored
    * form scanned lineitem and paid the distinct TWICE per gate
    * (profiled: a 188 MiB double-scan stage at sf0.1). */
  private def tradeEdges(spark: SparkSession, d: String): DataFrame = {
    val trade = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
      .localCheckpoint(eager = true)
    trade.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(trade.select(col("supp").as("src"), col("cust").as("dst")))
  }

  /** Gate `pagerank`: 3 exact iterations over the customer↔supplier
    * trade graph (who bought from whom, both directions; supplier ids
    * offset by 10⁶ into a disjoint id space). */
  // edgesDistinct: tradeEdges is a checkpointed DISTINCT (cust, supp)
  // set unioned with its swap, and the two directions live in disjoint
  // id spaces (supp offset by 10⁶), so no (src, dst) pair can repeat —
  // the in-operator dedup would be a full no-op aggregation over E.
  def pagerankGate(spark: SparkSession, d: String): DataFrame =
    pagerank(tradeEdges(spark, d), iters = 3, edgesDistinct = true)
      .orderBy(col("id"))

  val pagerankSql: String =
    """WITH trade AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS supp
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |edges AS (
      |  SELECT cust AS src, supp AS dst FROM trade
      |  UNION ALL
      |  SELECT supp AS src, cust AS dst FROM trade),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
      |        FROM edges GROUP BY src),
      |nodes AS (SELECT DISTINCT src AS id FROM edges
      |          UNION SELECT DISTINCT dst FROM edges),
      |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
      |s1 AS (SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.outdeg)) AS m
      |       FROM edges e JOIN r0 r ON e.src = r.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r1 AS (SELECT n.id, CAST(150000000 + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s1 s ON n.id = s.id),
      |s2 AS (SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.outdeg)) AS m
      |       FROM edges e JOIN r1 r ON e.src = r.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r2 AS (SELECT n.id, CAST(150000000 + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s2 s ON n.id = s.id),
      |s3 AS (SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.outdeg)) AS m
      |       FROM edges e JOIN r2 r ON e.src = r.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r3 AS (SELECT n.id, CAST(150000000 + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s3 s ON n.id = s.id)
      |SELECT id, rank FROM r3 ORDER BY id""".stripMargin

  /** Bounded-hop BFS distances from a seed set — "what can this entity
    * reach in ≤ k hops" (blast-radius / influence-neighborhood
    * queries). Exact integer hop counts; a node reachable by several
    * paths takes its MINIMUM distance (the frontier-union min — each
    * round is one edge-keyed join + one min aggregation, the C6
    * label-propagation shape with a hop counter instead of a label).
    * Frontier trick: only nodes FIRST reached in round i−1 expand in
    * round i (already-settled nodes re-derive nothing), so total join
    * work is O(E · avg-eccentricity-within-k), not O(E·k). Output:
    * (id, dist) for every node within k hops, seeds at dist 0. */
  def khopDistances(edges: DataFrame, seeds: DataFrame, k: Int,
      anchor: Anchor = Anchor.Local,
      edgesDistinct: Boolean = false): DataFrame = {
    require(k >= 1 && k <= 30, s"k=$k out of [1,30]")
    val Seq(s, t) = edges.columns.take(2).toSeq
    // src-partitioned anchor + hash-build frontier join: the O(E)
    // frame is exchanged once and streamed per hop (see [[pagerank]],
    // r18); `settled` stays a LAZY union of the per-hop anchored
    // frontiers — every constituent is already lineage-truncated, so
    // re-anchoring the union only re-copied ≤ V rows per hop and
    // added a blocking job. edgesDistinct (caller-proved duplicate-free
    // input) skips the dedup aggregation; duplicates would not change
    // min-dist semantics (the per-hop distinct absorbs them) but would
    // inflate every frontier join's output.
    val eraw = edges.select(col(s).cast("long").as("src"),
      col(t).cast("long").as("dst")).repartition(npart(edges), col("src"))
    val e = anchor(if (edgesDistinct) eraw else eraw.distinct())
    var settled = anchor(seeds.select(col(seeds.columns.head).cast("long").as("id"))
      .distinct().withColumn("dist", lit(0L)))
    var frontier = settled
    var hop = 1
    while (hop <= k && !frontier.isEmpty) {
      val next = anchor(e.join(
          frontier.select(col("id").as("src")).hint("shuffle_hash"),
          Seq("src"))
        .select(col("dst").as("id")).distinct()
        .join(settled.select(col("id")), Seq("id"), "left_anti")
        .withColumn("dist", lit(hop.toLong)))
      settled = settled.unionByName(next)
      frontier = next
      hop += 1
    }
    settled
  }

  /** Gate `triangles`: triangle census of the co-purchase graph (parts
    * sharing an order, support ≥ 2 orders — the B29 edge definition;
    * baskets are ≤ ~7 items so pair generation is row-bounded). */
  def triangleGate(spark: SparkSession, d: String): DataFrame = {
    val items = Tables.lineitem(spark, d)
      .select(col("l_orderkey").as("o"), col("l_partkey").as("p"))
      .distinct()
    val edges = items.select(col("o"), col("p").as("pa"))
      .join(items.select(col("o"), col("p").as("pb")), Seq("o"))
      .filter(col("pa") < col("pb"))
      .groupBy(col("pa"), col("pb")).agg(count(lit(1)).as("n"))
      .filter(col("n") >= 2)
      .select(col("pa"), col("pb"))
    triangleCount(edges)
  }

  val triangleSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem),
      |e0 AS (
      |  SELECT a.p AS src, b.p AS dst
      |  FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      |  GROUP BY a.p, b.p HAVING COUNT(*) >= 2),
      |und AS (
      |  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
      |  FROM e0 WHERE src <> dst),
      |deg AS (
      |  SELECT id, CAST(COUNT(*) AS BIGINT) AS d
      |  FROM (SELECT a AS id FROM und UNION ALL SELECT b FROM und)
      |  GROUP BY id),
      |o AS (
      |  SELECT CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
      |           THEN u.a ELSE u.b END AS src,
      |         CASE WHEN da.d < db.d OR (da.d = db.d AND u.a < u.b)
      |           THEN u.b ELSE u.a END AS dst
      |  FROM und u JOIN deg da ON da.id = u.a JOIN deg db ON db.id = u.b),
      |wd AS (
      |  SELECT o1.dst AS vv, o2.dst AS ww
      |  FROM o o1 JOIN o o2 ON o1.src = o2.src AND o1.dst <> o2.dst),
      |tri AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles
      |  FROM wd JOIN o ON wd.vv = o.src AND wd.ww = o.dst),
      |st AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nodes,
      |    CAST(SUM(d * (d - 1)) // 2 AS BIGINT) AS n_wedges
      |  FROM deg),
      |ec AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_edges FROM und)
      |SELECT n_nodes, n_edges, n_wedges, n_triangles
      |FROM st CROSS JOIN ec CROSS JOIN tri""".stripMargin

  /** Gate `khop`: 2-hop blast radius on the trade graph from the
    * nation-0 suppliers — hop 1 = their customers, hop 2 = the OTHER
    * suppliers those customers also buy from (supply-chain exposure). */
  def khopGate(spark: SparkSession, d: String): DataFrame = {
    val seeds = Tables.supplier(spark, d)
      .filter(col("s_nationkey") === 0)
      .select((col("s_suppkey") + 1000000L).as("id"))
    khopDistances(tradeEdges(spark, d), seeds, k = 2,
      edgesDistinct = true) // provably duplicate-free: see pagerankGate
      .orderBy(col("id"))
  }

  val khopSql: String =
    """WITH trade AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS supp
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |e AS (
      |  SELECT cust AS src, supp AS dst FROM trade
      |  UNION ALL
      |  SELECT supp AS src, cust AS dst FROM trade),
      |d0 AS (
      |  SELECT DISTINCT s_suppkey + 1000000 AS id FROM supplier
      |  WHERE s_nationkey = 0),
      |f1 AS (
      |  SELECT DISTINCT e.dst AS id FROM e JOIN d0 ON e.src = d0.id
      |  WHERE e.dst NOT IN (SELECT id FROM d0)),
      |f2 AS (
      |  SELECT DISTINCT e.dst AS id FROM e JOIN f1 ON e.src = f1.id
      |  WHERE e.dst NOT IN (SELECT id FROM d0)
      |    AND e.dst NOT IN (SELECT id FROM f1))
      |SELECT id, CAST(0 AS BIGINT) AS dist FROM d0
      |UNION ALL SELECT id, CAST(1 AS BIGINT) FROM f1
      |UNION ALL SELECT id, CAST(2 AS BIGINT) FROM f2
      |ORDER BY id""".stripMargin

  /** Gate `ppr`: 3 exact restart-walk iterations on the trade graph,
    * seeded at the suppliers of the smallest nation key PRESENT in the
    * supplier table (data-derived, so the seed set is nonempty at any
    * SF — sf0.001 has no nation-0 supplier) — "which customers and
    * suppliers sit closest to this nation's supply base", the
    * related-entities question B34's global rank cannot answer. */
  def pprGate(spark: SparkSession, d: String): DataFrame = {
    val edges = tradeEdges(spark, d)
    val sup = Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val minNat = sup.agg(min(col("s_nationkey")).as("_mn"))
    val seeds = sup.crossJoin(broadcast(minNat)) // 1-row scalar
      .filter(col("s_nationkey") === col("_mn"))
      .select((col("s_suppkey") + 1000000L).as("id"))
    personalizedPagerank(edges, seeds, iters = 3,
      edgesDistinct = true) // provably duplicate-free: see pagerankGate
      .orderBy(col("id"))
  }

  val pprSql: String =
    """WITH trade AS (
      |  SELECT DISTINCT o.o_custkey AS cust, l.l_suppkey + 1000000 AS supp
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
      |edges AS (
      |  SELECT cust AS src, supp AS dst FROM trade
      |  UNION ALL
      |  SELECT supp AS src, cust AS dst FROM trade),
      |deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS outdeg
      |        FROM edges GROUP BY src),
      |seeds AS (SELECT DISTINCT s_suppkey + 1000000 AS id FROM supplier
      |          WHERE s_nationkey = (SELECT MIN(s_nationkey) FROM supplier)),
      |nodes AS (SELECT DISTINCT src AS id FROM edges
      |          UNION SELECT DISTINCT dst FROM edges
      |          UNION SELECT id FROM seeds),
      |r0 AS (SELECT n.id,
      |         CAST(CASE WHEN n.id IN (SELECT id FROM seeds)
      |           THEN 1000000000 ELSE 0 END AS BIGINT) AS rank
      |       FROM nodes n),
      |s1 AS (SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.outdeg)) AS m
      |       FROM edges e JOIN r0 r ON e.src = r.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r1 AS (SELECT n.id, CAST(CASE WHEN n.id IN (SELECT id FROM seeds)
      |         THEN 150000000 ELSE 0 END + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s1 s ON n.id = s.id),
      |s2 AS (SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.outdeg)) AS m
      |       FROM edges e JOIN r1 r ON e.src = r.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r2 AS (SELECT n.id, CAST(CASE WHEN n.id IN (SELECT id FROM seeds)
      |         THEN 150000000 ELSE 0 END + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s2 s ON n.id = s.id),
      |s3 AS (SELECT e.dst AS id, SUM((r.rank * 85) // (100 * d.outdeg)) AS m
      |       FROM edges e JOIN r2 r ON e.src = r.id JOIN deg d ON d.src = e.src
      |       GROUP BY e.dst),
      |r3 AS (SELECT n.id, CAST(CASE WHEN n.id IN (SELECT id FROM seeds)
      |         THEN 150000000 ELSE 0 END + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s3 s ON n.id = s.id)
      |SELECT id, rank FROM r3 ORDER BY id""".stripMargin

  /** Gate `pagerank_weighted`: 3 exact iterations over the trade graph
    * with edge weight = the number of DISTINCT ORDERS connecting the
    * customer and supplier — volume-weighted centrality, the question
    * B34's unweighted rank flattens (a 100-order relationship counts
    * like a 1-order one there). */
  def pagerankWeightedGate(spark: SparkSession, d: String): DataFrame = {
    // anchored before the direction union — the tradeEdges rationale
    val trade = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"), col("l_orderkey"))
      .distinct()
      .groupBy(col("cust"), col("supp"))
      .agg(count(lit(1)).as("w"))
      .localCheckpoint(eager = true)
    val edges = trade.select(col("cust").as("src"), col("supp").as("dst"), col("w"))
      .unionByName(trade.select(col("supp").as("src"), col("cust").as("dst"), col("w")))
    pagerankWeighted(edges, iters = 3).orderBy(col("id"))
  }

  val pagerankWeightedSql: String =
    """WITH trade AS (
      |  SELECT cust, supp, CAST(COUNT(*) AS BIGINT) AS w FROM (
      |    SELECT DISTINCT o.o_custkey AS cust,
      |      l.l_suppkey + 1000000 AS supp, l.l_orderkey
      |    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey)
      |  GROUP BY cust, supp),
      |edges AS (
      |  SELECT cust AS src, supp AS dst, w FROM trade
      |  UNION ALL
      |  SELECT supp AS src, cust AS dst, w FROM trade),
      |e AS (SELECT src, dst, CAST(SUM(w) AS BIGINT) AS w
      |      FROM edges GROUP BY src, dst),
      |ow AS (SELECT src, CAST(SUM(w) AS BIGINT) AS outw
      |       FROM e GROUP BY src),
      |nodes AS (SELECT DISTINCT src AS id FROM e
      |          UNION SELECT DISTINCT dst FROM e),
      |r0 AS (SELECT id, CAST(1000000000 AS BIGINT) AS rank FROM nodes),
      |s1 AS (SELECT e.dst AS id,
      |         SUM((((r.rank * 85) // 100) * e.w) // o.outw) AS m
      |       FROM e JOIN r0 r ON e.src = r.id JOIN ow o ON o.src = e.src
      |       GROUP BY e.dst),
      |r1 AS (SELECT n.id, CAST(150000000 + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s1 s ON n.id = s.id),
      |s2 AS (SELECT e.dst AS id,
      |         SUM((((r.rank * 85) // 100) * e.w) // o.outw) AS m
      |       FROM e JOIN r1 r ON e.src = r.id JOIN ow o ON o.src = e.src
      |       GROUP BY e.dst),
      |r2 AS (SELECT n.id, CAST(150000000 + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s2 s ON n.id = s.id),
      |s3 AS (SELECT e.dst AS id,
      |         SUM((((r.rank * 85) // 100) * e.w) // o.outw) AS m
      |       FROM e JOIN r2 r ON e.src = r.id JOIN ow o ON o.src = e.src
      |       GROUP BY e.dst),
      |r3 AS (SELECT n.id, CAST(150000000 + COALESCE(s.m, 0) AS BIGINT) AS rank
      |       FROM nodes n LEFT JOIN s3 s ON n.id = s.id)
      |SELECT id, rank FROM r3 ORDER BY id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> pagerankGate _,
    "triangles" -> triangleGate _,
    "khop" -> khopGate _,
    "ppr" -> pprGate _,
    "pagerank_weighted" -> pagerankWeightedGate _)

  val oracles: Map[String, String] = Map(
    "pagerank" -> pagerankSql,
    "triangles" -> triangleSql,
    "khop" -> khopSql,
    "ppr" -> pprSql,
    "pagerank_weighted" -> pagerankWeightedSql)
}
