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
  * set are localCheckpointed ONCE (eager — the SemDedup contract) and
  * reused every iteration, ranks checkpoint per iteration so lineage
  * stays flat. No step is ever all-pairs; iterations cost O(E) shuffle
  * each, exactly GraphX's PageRank shape without leaving DataFrames.
  */
object GraphOps {

  /** Exact integer PageRank. `edges`: first two columns are (src, dst).
    * Returns (id, rank) with rank in `scale` units. */
  def pagerank(edges: DataFrame, iters: Int = 3, dampingPct: Int = 85,
               scale: Long = 1000000000L): DataFrame = {
    require(iters >= 1 && iters <= 50, s"iters=$iters out of [1,50]")
    require(dampingPct >= 1 && dampingPct <= 99, s"dampingPct=$dampingPct")
    val Seq(s, t) = edges.columns.take(2).toSeq
    val e = edges.select(col(s).cast("long").as("src"),
      col(t).cast("long").as("dst")).distinct()
    val deg = e.groupBy(col("src")).agg(count(lit(1)).as("outdeg"))
    val ed = e.join(deg, Seq("src")).localCheckpoint()
    val nodes = e.select(col("src").as("id"))
      .union(e.select(col("dst").as("id"))).distinct().localCheckpoint()
    val teleport = scale * (100L - dampingPct) / 100L
    // "pr" internally: `rank` inside expr() would parse as the window
    // function and demand an OVER clause
    var r = nodes.withColumn("pr", lit(scale))
    for (_ <- 1 to iters) {
      val contrib = ed.join(r, ed("src") === r("id"))
        .select(col("dst"),
          expr(s"(pr * $dampingPct) div (100 * outdeg)").as("m"))
        .groupBy(col("dst")).agg(sum(col("m")).as("m"))
      r = nodes.join(contrib, nodes("id") === contrib("dst"), "left")
        .select(col("id"), (lit(teleport) + coalesce(col("m"), lit(0L)))
          .as("pr"))
        .localCheckpoint()
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

  // ---------------------------------------------------------------- gate

  /** Gate `pagerank`: 3 exact iterations over the customer↔supplier
    * trade graph (who bought from whom, both directions; supplier ids
    * offset by 10⁶ into a disjoint id space). */
  def pagerankGate(spark: SparkSession, d: String): DataFrame = {
    val trade = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Tables.orders(spark, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("cust"),
        (col("l_suppkey") + 1000000L).as("supp"))
      .distinct()
    val edges = trade.select(col("cust").as("src"), col("supp").as("dst"))
      .unionByName(trade.select(col("supp").as("src"), col("cust").as("dst")))
    pagerank(edges, iters = 3).orderBy(col("id"))
  }

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "pagerank" -> pagerankGate _)

  val oracles: Map[String, String] = Map(
    "pagerank" -> pagerankSql)
}
