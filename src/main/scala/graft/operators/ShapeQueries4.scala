package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The last five TPC-H shapes (Q2, Q9, Q11, Q16, Q20) adapted to this
  * schema — completing 22/22 analytics coverage. The testdata carries
  * no `partsupp` table, so the supply relation is DERIVED from the
  * fact table itself: `ps(partkey, suppkey, cost_c)` with cost = the
  * minimum observed unit price in integer cents
  * (`min(floor((l_extendedprice / l_quantity)·100 + 0.5))` — one IEEE
  * division and one floor per row, bit-identical cross-engine; MIN is
  * order-independent so the aggregate is exact). The plan SHAPES are
  * the canonical ones the five queries exist to exercise:
  *
  *  - Q2  — correlated MIN subquery (min-cost supplier per part),
  *          decorrelated Spark-side into groupBy + self-join on the
  *          (key, min) pair — the textbook rewrite Catalyst cannot do
  *          across a derived relation.
  *  - Q9  — profit decomposition: fact × derived-cost co-keyed join,
  *          exact integer profit term summed per (nation, year).
  *  - Q11 — group-filtered share: per-part value HAVING > 1/1000 of
  *          the 1-row global total (integer cross-multiplied compare —
  *          `value·1000 > total` — no float threshold).
  *  - Q16 — distinct-count with an exclusion anti-join (suppliers in
  *          deficit stand in for the complaint-comment filter the
  *          schema lacks).
  *  - Q20 — nested exists-chain: suppliers holding a DOMINANT share
  *          (strictly more than half the 1997 volume) of any red part,
  *          restricted to one region.
  *
  * Scale: the only lineitem-sized work in each query is one projected
  * scan + one map-side-combinable aggregation (ps derivation / value
  * rollup); everything downstream is parts×suppliers-sized or
  * smaller. Dimensions broadcast; region/nation restrictions are
  * semi-joins so no payload column rides a shuffle it doesn't need.
  *
  * At 100 TB, re-deriving ps per query is the tier's dominant cost —
  * materialize it once with [[SupplyMart]] (high-water incremental
  * refresh) and run the `*From` variants: q2/q11/q16 then never touch
  * the fact table at all, q9 joins it once. The gated inline forms and
  * the mart-fed forms are bit-identical (SupplyMartSpec).
  */
object ShapeQueries4 {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** Derived supply relation: min observed unit price (cents) per
    * (part, supplier). One map-side-combinable shuffle. */
  private def ps(spark: SparkSession, d: String): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice") / col("l_quantity")).as("_uc"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("_uc")).as("cost_c"))

  /** [[ps]] restricted to a part-key set BEFORE the pair rollup (r18,
    * guide §3.2): a per-(part, supplier) MIN commutes with any
    * partkey-level filter, so a gate whose output only surfaces a
    * known part subset can shrink the rollup's input ~selectivity-fold
    * before it shuffles. The mart-fed `*From` variants are untouched
    * (the mart is already materialized at full grain). */
  private def psFor(spark: SparkSession, d: String,
      partkeys: DataFrame): DataFrame =
    Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice") / col("l_quantity")).as("_uc"))
      .join(broadcast(partkeys.select(col("p_partkey"))),
        col("l_partkey") === col("p_partkey"), "left_semi")
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(min(col("_uc")).as("cost_c"))

  /** Q2's part predicate — ONE spelling for the gate's supply
    * pre-filter and the From-variant's dimension join. */
  private def q2Parts(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .filter(col("p_type") === "SMALL" && col("p_size") <= 15)
      .select(col("p_partkey"), col("p_name"))

  /** Suppliers of one region with their nation name (broadcast-sized:
    * the supplier dimension). */
  private def regionSuppliers(spark: SparkSession, d: String,
      region: String): DataFrame =
    Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("s_nationkey"))
      .join(broadcast(Tables.nation(spark, d)
        .select(col("n_nationkey"), col("n_name"), col("n_regionkey"))),
        col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(spark, d)
        .filter(col("r_name") === region).select(col("r_regionkey"))),
        col("n_regionkey") === col("r_regionkey"), "left_semi")
      .select(col("s_suppkey"), col("s_name"), col("s_acctbal"),
        col("n_name"))

  /** B39 / TPC-H Q2: for every SMALL part of size ≤ 15, the EUROPE
    * supplier(s) offering the minimum derived supply cost. The
    * correlated `cost = (SELECT MIN ...)` subquery decorrelates into a
    * per-part MIN over the region-restricted supply relation joined
    * back on equality — ties (several suppliers at the min) all
    * surface, exactly TPC-H semantics. */
  def q2MinCost(spark: SparkSession, d: String): DataFrame =
    q2MinCostFrom(spark, d, psFor(spark, d, q2Parts(spark, d)))

  /** Q2 over an explicit supply relation — point it at
    * [[SupplyMart.read]] and the fact table drops out of the plan
    * entirely (the mart IS the only lineitem-derived input Q2 needs);
    * bit-identical to the inline form (SupplyMartSpec). */
  def q2MinCostFrom(spark: SparkSession, d: String,
      supply: DataFrame): DataFrame = {
    val parts = q2Parts(spark, d)
    val rps = supply.select(col("l_partkey"), col("l_suppkey"), col("cost_c"))
      .join(broadcast(regionSuppliers(spark, d, "EUROPE")),
        col("l_suppkey") === col("s_suppkey"))
    val target = rps.join(broadcast(parts),
      col("l_partkey") === col("p_partkey"))
    val minc = target.groupBy(col("p_partkey").as("_pk"))
      .agg(min(col("cost_c")).as("_min_c"))
    target.join(minc,
        col("p_partkey") === col("_pk") && col("cost_c") === col("_min_c"))
      .select(col("s_acctbal"), col("s_name"), col("n_name"),
        col("p_partkey"), col("p_name"),
        (col("cost_c").cast("double") / lit(100.0)).as("supply_cost"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"),
        col("p_partkey"))
  }

  val q2MinCostSql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    MIN(CAST(floor((l_extendedprice / l_quantity) * 100 + 0.5)
      |      AS BIGINT)) AS cost_c
      |  FROM lineitem GROUP BY 1, 2),
      |rs AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'EUROPE')
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  CAST(cost_c AS DOUBLE) / 100.0 AS supply_cost
      |FROM part
      |JOIN ps ON ps.pk = p_partkey
      |JOIN rs ON rs.s_suppkey = ps.sk
      |WHERE p_type = 'SMALL' AND p_size <= 15
      |  AND cost_c = (SELECT MIN(ps2.cost_c)
      |                FROM ps ps2 JOIN rs rs2 ON rs2.s_suppkey = ps2.sk
      |                WHERE ps2.pk = p_partkey)
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey""".stripMargin

  /** B40 / TPC-H Q9: profit on gizmo-family parts decomposed by
    * supplier nation and order year. profit per lineitem, all in
    * 10⁻⁴-dollar integer units: revenue cents·(100−disc) minus derived
    * unit cost · quantity · 100. ONE final IEEE division per group. */
  def q9Profit(spark: SparkSession, d: String): DataFrame = {
    // pre-filter the supply DERIVATION by the gizmo part set (r18,
    // guide §3.2 "reduce the big side before shuffling"): the final
    // result only ever surfaces gizmo pairs (the fact side is
    // semi-joined on the same set), and a per-pair MIN is untouched by
    // a partkey-level filter — so both sides of the pair-grain join
    // shrink ~18× (p_name LIKE selectivity) before the groupBy and the
    // join pay their shuffles. The mart-fed q9ProfitFrom path reads
    // the prebuilt full mart unchanged.
    val gizmo = Tables.part(spark, d)
      .filter(col("p_name").like("%gizmo%")).select(col("p_partkey"))
    q9ProfitFrom(spark, d, psFor(spark, d, gizmo))
  }

  /** Q9 over an explicit supply relation: the fact joins the mart ONCE
    * (pair grain) instead of re-deriving it — one lineitem scan, zero
    * rollup shuffles when `supply` is [[SupplyMart.read]]. */
  def q9ProfitFrom(spark: SparkSession, d: String,
      supply: DataFrame): DataFrame = {
    val li = Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_extendedprice"), col("l_discount"), col("l_quantity"))
    val gizmo = Tables.part(spark, d)
      .filter(col("p_name").like("%gizmo%")).select(col("p_partkey"))
    val sup = Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Tables.nation(spark, d)
      .select(col("n_nationkey"), col("n_name"))
    val ord = Tables.orders(spark, d)
      .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
    val profit = revC(col("l_extendedprice"), col("l_discount")) -
      col("cost_c") * col("l_quantity").cast("long") * lit(100L)
    li.join(broadcast(gizmo), col("l_partkey") === col("p_partkey"), "left_semi")
      .join(supply.select(col("l_partkey"), col("l_suppkey"), col("cost_c")),
        Seq("l_partkey", "l_suppkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), col("o_year"))
      .agg((sum(profit).cast("double") / lit(10000.0)).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val q9ProfitSql: String =
    """WITH ps AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    MIN(CAST(floor((l_extendedprice / l_quantity) * 100 + 0.5)
      |      AS BIGINT)) AS cost_c
      |  FROM lineitem GROUP BY 1, 2)
      |SELECT n_name AS nation, EXTRACT(YEAR FROM o_orderdate) AS o_year,
      |  CAST(SUM(
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |      * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
      |    - cost_c * CAST(l_quantity AS BIGINT) * 100) AS DOUBLE)
      |    / 10000.0 AS profit
      |FROM lineitem
      |JOIN ps ON ps.pk = l_partkey AND ps.sk = l_suppkey
      |JOIN part ON p_partkey = l_partkey
      |JOIN supplier ON s_suppkey = l_suppkey
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN orders ON o_orderkey = l_orderkey
      |WHERE p_name LIKE '%gizmo%'
      |GROUP BY 1, 2
      |ORDER BY nation, o_year DESC""".stripMargin

  /** B41 / TPC-H Q11: parts whose AFRICA-supplied revenue exceeds
    * 1/1000 of the total AFRICA-supplied revenue. The share filter is
    * an integer cross-multiplication against a broadcast 1-row global
    * aggregate — no float threshold, no second scan. */
  def q11Important(spark: SparkSession, d: String): DataFrame = {
    val afr = regionSuppliers(spark, d, "AFRICA").select(col("s_suppkey"))
    val v = Tables.lineitem(spark, d)
      .select(col("l_partkey"), col("l_suppkey"),
        cents(col("l_extendedprice")).as("_vc"))
      .join(broadcast(afr), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("_vc")).as("value_c"))
    q11Downstream(v)
  }

  /** Q11 over an explicit supply relation: the AFRICA restriction is
    * per-supplier, so applying it to the (part, supplier) pair
    * partials and re-summing is lossless — exact integer sums make the
    * regrouping bit-identical to the inline per-row form. With
    * [[SupplyMart.read]] the fact table drops out of the plan. */
  def q11ImportantFrom(spark: SparkSession, d: String,
      supply: DataFrame): DataFrame = {
    val afr = regionSuppliers(spark, d, "AFRICA").select(col("s_suppkey"))
    val v = supply.select(col("l_partkey"), col("l_suppkey"), col("value_c"))
      .join(broadcast(afr), col("l_suppkey") === col("s_suppkey"),
        "left_semi")
      .groupBy(col("l_partkey"))
      .agg(sum(col("value_c")).as("value_c"))
    q11Downstream(v)
  }

  private def q11Downstream(v: DataFrame): DataFrame = {
    val tot = v.agg(sum(col("value_c")).as("total_c"))
    v.crossJoin(broadcast(tot)) // 1-row global total
      .filter(col("value_c") * 1000 > col("total_c"))
      .select(col("l_partkey"),
        (col("value_c").cast("double") / lit(100.0)).as("value"))
      .orderBy(col("value").desc, col("l_partkey"))
  }

  val q11ImportantSql: String =
    """WITH afr AS (
      |  SELECT s_suppkey FROM supplier
      |  JOIN nation ON n_nationkey = s_nationkey
      |  JOIN region ON r_regionkey = n_regionkey
      |  WHERE r_name = 'AFRICA'),
      |v AS (
      |  SELECT l_partkey,
      |    SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)) AS value_c
      |  FROM lineitem
      |  WHERE l_suppkey IN (SELECT s_suppkey FROM afr)
      |  GROUP BY 1)
      |SELECT l_partkey, CAST(value_c AS DOUBLE) / 100.0 AS value
      |FROM v
      |WHERE value_c * 1000 > (SELECT SUM(value_c) FROM v)
      |ORDER BY value DESC, l_partkey""".stripMargin

  /** B42 / TPC-H Q16: distinct supplier count per (brand, type, size)
    * over the derived supply pairs, excluding excluded-list suppliers
    * (deficit account stands in for the complaint filter) via
    * anti-join, and excluding one brand + one type + off-list sizes. */
  def q16SupplierCnt(spark: SparkSession, d: String): DataFrame =
    // part-level pre-filter commutes with the pair distinct (r18, the
    // psFor rationale); q16Parts is the From-variant's own predicate
    q16SupplierCntFrom(spark, d,
      Tables.lineitem(spark, d)
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(q16Parts(spark, d).select(col("p_partkey"))),
          col("l_partkey") === col("p_partkey"), "left_semi")
        .distinct())

  /** Q16 over an explicit supply relation — the mart's keys ARE the
    * distinct (part, supplier) pairs, so with [[SupplyMart.read]] the
    * distinct-shuffle over the fact disappears. `supply` needs only
    * the two key columns. */
  /** Q16's part predicate — ONE spelling (gate pre-filter + join). */
  private def q16Parts(spark: SparkSession, d: String): DataFrame =
    Tables.part(spark, d)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 4, 9, 14, 23, 36, 45, 49))
      .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))

  def q16SupplierCntFrom(spark: SparkSession, d: String,
      supplyPairs: DataFrame): DataFrame = {
    val supply = supplyPairs.select(col("l_partkey"), col("l_suppkey"))
    val excluded = Tables.supplier(spark, d)
      .filter(col("s_acctbal") < 0).select(col("s_suppkey"))
    val pts = q16Parts(spark, d)
    supply
      .join(broadcast(excluded), col("l_suppkey") === col("s_suppkey"),
        "left_anti")
      .join(broadcast(pts), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand"), col("p_type"), col("p_size"))
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
        col("p_size"))
  }

  val q16SupplierCntSql: String =
    """SELECT p_brand, p_type, p_size,
      |  CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
      |FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem) supply
      |JOIN part ON p_partkey = l_partkey
      |WHERE p_brand <> 'Brand#5' AND p_type <> 'PROMO'
      |  AND p_size IN (1, 4, 9, 14, 23, 36, 45, 49)
      |  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
      |                        WHERE s_acctbal < 0)
      |GROUP BY 1, 2, 3
      |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin

  /** B43 / TPC-H Q20: EUROPE suppliers holding a DOMINANT share of a
    * red part's 1997 volume — shipped strictly more than half of that
    * part's total 1997 quantity (the exists-chain: supplier ∈ dominant
    * supply pairs ⊂ red parts ⊂ 1997 volume). Quantities are integral
    * in this corpus; the compare is integer cross-multiplied
    * (`2·supplier_qty > part_qty`). The per-part total derives from
    * the per-(part,supplier) rollup — one scan, two-level combine. */
  def q20Dominant(spark: SparkSession, d: String): DataFrame = {
    val red = Tables.part(spark, d)
      .filter(col("p_name").like("red%")).select(col("p_partkey"))
    val ord97 = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1997-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select(col("o_orderkey"))
    val li97 = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
        col("l_quantity").cast("long").as("_q"))
      .join(ord97, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .join(broadcast(red), col("l_partkey") === col("p_partkey"),
        "left_semi")
    // anchored (r19): perPS feeds both the per-part total and the
    // dominance join — un-anchored, Catalyst duplicates the whole
    // lineitem scan + two semi-joins + rollup subtree (plan-verified:
    // 18 parquet scans for a 4-table query). The (part, supplier)
    // rollup is the small decision frame; materialize it once
    // (guide §2.4 / §8 "decide with small rows").
    val perPS = li97.groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("_q")).as("sq"))
      .localCheckpoint()
    val perP = perPS.groupBy(col("l_partkey")).agg(sum(col("sq")).as("tq"))
    val dominant = perPS.join(perP, Seq("l_partkey"))
      .filter(col("sq") * 2 > col("tq"))
      .select(col("l_suppkey")).distinct()
    regionSuppliers(spark, d, "EUROPE")
      .join(dominant, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select(col("s_name"), col("s_acctbal"))
      .orderBy(col("s_name"))
  }

  val q20DominantSql: String =
    """WITH li97 AS (
      |  SELECT l_partkey AS pk, l_suppkey AS sk,
      |    CAST(l_quantity AS BIGINT) AS q
      |  FROM lineitem
      |  JOIN orders ON o_orderkey = l_orderkey
      |  WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |    AND l_partkey IN (SELECT p_partkey FROM part
      |                      WHERE p_name LIKE 'red%')),
      |pps AS (SELECT pk, sk, SUM(q) AS sq FROM li97 GROUP BY 1, 2),
      |pp AS (SELECT pk, SUM(sq) AS tq FROM pps GROUP BY 1)
      |SELECT s_name, s_acctbal
      |FROM supplier
      |JOIN nation ON n_nationkey = s_nationkey
      |JOIN region ON r_regionkey = n_regionkey
      |WHERE r_name = 'EUROPE'
      |  AND s_suppkey IN (SELECT sk FROM pps JOIN pp USING (pk)
      |                    WHERE 2 * sq > tq)
      |ORDER BY s_name""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q2_min_cost" -> q2MinCost _,
    "q9_profit" -> q9Profit _,
    "q11_important" -> q11Important _,
    "q16_supplier_cnt" -> q16SupplierCnt _,
    "q20_dominant" -> q20Dominant _)

  val oracles: Map[String, String] = Map(
    "q2_min_cost" -> q2MinCostSql,
    "q9_profit" -> q9ProfitSql,
    "q11_important" -> q11ImportantSql,
    "q16_supplier_cnt" -> q16SupplierCntSql,
    "q20_dominant" -> q20DominantSql)
}
