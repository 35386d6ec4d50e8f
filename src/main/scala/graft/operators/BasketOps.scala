package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B29: market-basket co-occurrence mining — the "frequently bought
  * together" rollup (the 2-itemset core of association-rule mining;
  * Agrawal-Srikant Apriori's first and, in practice, dominant pass)
  * over any (basket, item) incidence table. Pair support counts plus
  * the LIFT ratio (observed co-occurrence vs the independence
  * expectation) — the statistic that separates "popular items co-occur
  * by chance" from a real association.
  *
  * Scale: the quadratic is confined PER BASKET — a distinct-items
  * projection (one combinable aggregate), then a basket-keyed
  * self-join emitting only `item_a < item_b` pairs, so a basket of b
  * items costs b·(b−1)/2 pairs and the corpus cost is Σ b_i², never
  * |items|². That sum is safe exactly when baskets are bounded, so a
  * basket past `maxBasket` FAILS LOUDLY with the raise_error riding
  * the basket's own data flow (the RecordLinkage block-cap
  * convention — Catalyst cannot prune a guard that lives on the
  * joined column). The support filter runs before the dimension
  * (per-item count) join, so lift is computed on the support-surviving
  * pairs only; the per-item counts frame is |items|-sized and
  * broadcast-eligible.
  *
  * Exactness: supports are exact integers; lift = (n_ab · N) /
  * (n_a · n_b) with both products exact in int64 and ONE final IEEE
  * division (the q14 convention) — bit-identical cross-engine.
  */
object BasketOps {

  /** Co-occurrence pairs with support ≥ minSupport and lift.
    * Output: (item_a, item_b, n_pair, n_a, n_b, lift), item_a < item_b.
    * `nBaskets` (the N in lift) is derived from the same incidence
    * frame — callers never pass a count that could drift from the
    * data.
    *
    * Shape (r18, the candidatePairs cell rewrite): each basket
    * collapses to ONE distinct-item array row — the size cap rides the
    * array column (Catalyst cannot prune the guard), and the per-item
    * counts, the basket count AND the pair explosion all derive from
    * the anchored cell frame, so the incidence scan+distinct runs once
    * instead of four times (the old boundedItems self-join shape also
    * let AQE serialize the quadratic onto the basket key's few
    * post-shuffle partitions). The cell frame is explicitly
    * repartitioned so pair generation keeps full width. */
  def copurchasePairs(df: DataFrame, basket: String, item: String,
      minSupport: Long, maxBasket: Int = 1000): DataFrame = {
    require(minSupport >= 1, s"minSupport $minSupport")
    require(maxBasket >= 2, s"maxBasket $maxBasket")
    val npart = math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    // one basket-keyed exchange serves BOTH the distinct and the cell
    // aggregation (basket-hash partitioning satisfies the (basket,
    // item) clustering — the pagerank src-partitioning device); skew
    // is bounded by the maxBasket cap
    val cells = df.select(col(basket), col(item))
      .repartition(npart, col(basket)).distinct()
      .groupBy(col(basket))
      .agg(sort_array(collect_list(col(item))).as("_its"))
      .select(col(basket),
        when(size(col("_its")) > maxBasket,
          raise_error(concat(lit(s"basket over maxBasket=$maxBasket: "),
            col(basket).cast("string"), lit(" has "),
            size(col("_its")).cast("string"))))
          .otherwise(col("_its")).as("_its"))
      .repartition(npart, col(basket))
      .localCheckpoint(eager = true)
    val pairs = cells
      .select(explode(col("_its")).as("item_a"), col("_its"))
      .select(col("item_a"), explode(col("_its")).as("item_b"))
      .filter(col("item_a") < col("item_b"))
      .groupBy(col("item_a"), col("item_b"))
      .agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minSupport)
    // anchored (r19): itemCounts attaches to BOTH pair endpoints —
    // un-anchored, the explode+count over the cell arrays ran twice
    // (plan-verified: two identical subtrees off the cells anchor)
    val itemCounts = cells.select(explode(col("_its")).as(item))
      .groupBy(col(item)).agg(count(lit(1)).as("_n"))
      .localCheckpoint()
    // N as a 1-row aggregate crossJoin (broadcast, no driver action) —
    // the plan stays fully lazy and N can never drift from the data
    val nBaskets = cells.agg(count(lit(1)).as("_nb"))
    pairs
      .join(itemCounts.toDF("item_a", "n_a"), "item_a")
      .join(itemCounts.toDF("item_b", "n_b"), "item_b")
      .crossJoin(broadcast(nBaskets))
      .withColumn("lift",
        (col("n_pair") * col("_nb")).cast("double") /
          (col("n_a") * col("n_b")).cast("double"))
      .select("item_a", "item_b", "n_pair", "n_a", "n_b", "lift")
  }

  /** Gated entry (`copurchase`): parts co-ordered within one order,
    * support ≥ 2, with exact counts and the one-division lift.
    * TPC-H orders hold ≤ ~15 distinct parts, so the per-basket
    * quadratic is trivially bounded (cap 1000 is the loud guard for
    * misuse, not a tuning knob here). */
  def copurchaseGate(spark: SparkSession, d: String): DataFrame =
    copurchasePairs(Tables.load(spark, d, "lineitem"),
      "l_orderkey", "l_partkey", minSupport = 2)
      .orderBy(col("item_a"), col("item_b"))

  val copurchaseSql: String =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
      |pairs AS (
      |  SELECT a.l_partkey AS item_a, b.l_partkey AS item_b,
      |    COUNT(*) AS n_pair
      |  FROM items a JOIN items b
      |    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 2),
      |ic AS (SELECT l_partkey, COUNT(*) AS n FROM items GROUP BY 1),
      |nb AS (SELECT COUNT(DISTINCT l_orderkey) AS n_baskets FROM items)
      |SELECT p.item_a, p.item_b, p.n_pair, ia.n AS n_a, ib.n AS n_b,
      |  CAST(p.n_pair * nb.n_baskets AS DOUBLE)
      |    / CAST(ia.n * ib.n AS DOUBLE) AS lift
      |FROM pairs p
      |JOIN ic ia ON p.item_a = ia.l_partkey
      |JOIN ic ib ON p.item_b = ib.l_partkey
      |CROSS JOIN nb
      |ORDER BY item_a, item_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "copurchase" -> copurchaseGate _)

  val oracles: Map[String, String] = Map(
    "copurchase" -> copurchaseSql)
}
