package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Analytics / benchmark queries (SURVEY §2 B1–B5) plus the flagship
  * per-entity feature aggregation (A3).
  *
  * Scale notes: `lineitem`/`orders` are the fact side and are never
  * broadcast; dimension tables (`nation`, `region`, `supplier`,
  * `customer` at small SF) carry explicit `broadcast()` hints. Aggregates
  * are declarative `groupBy.agg` so Catalyst plans partial (map-side)
  * aggregation before the shuffle, and filters/projections sit directly on
  * the scan so they push into parquet.
  */
object CoreQueries {
  private def ts(s: String): Column = to_timestamp(lit(s))

  /** TPC-H Q1-style pricing summary (B1), integer-cents exact arithmetic.
    *
    * The money columns are 2-dp doubles; summing them exactly used to go
    * through DECIMAL(12,2), whose per-row double→BigDecimal cast was 4-5×
    * the cost of the whole rest of the aggregate (measured at 50× stress:
    * 35-40 s decimal vs ~4 s floor-cents — right at the unordered
    * double-sums floor; see Exact.cents for why floor, not round).
    * Cents-long arithmetic is equally exact — one FP floor + integer
    * multiplies per row, long sums — and both engines compute the
    * identical IEEE double at the end.
    *
    * Headroom: sum_charge accumulates price_cents×(100−d)×(100+t) ≈ 1e11
    * per row, so a long sum overflows past ~9e7 rows per group × 1e11 ≈
    * Long.Max. At sf100 (~600M lineitem rows, 6 groups) peak group sums
    * reach ~1e19 — past the ~9.2e18 bound. ANSI mode makes that a loud
    * error, not silent wraparound; at true 100 TB row counts, partition
    * the sum (sub-aggregate then decimal-sum the partials) or keep this
    * aggregate on the DECIMAL path — the choice is per-query, and the
    * store's native-DECIMAL parquet path avoids the cast entirely. */
  def q1Pricing(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    val qtyC = cents(col("l_quantity"))
    val priceC = cents(col("l_extendedprice"))
    val discC = cents(col("l_discount"))
    val taxC = cents(col("l_tax"))
    li.filter(col("l_shipdate") <= ts("2000-09-02 00:00:00"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        (sum(qtyC).cast("double") / 100).as("sum_qty"),
        (sum(priceC).cast("double") / 100).as("sum_base_price"),
        (sum(priceC * (lit(100L) - discC)).cast("double") / 10000).as("sum_disc_price"),
        (sum(priceC * (lit(100L) - discC) * (lit(100L) + taxC)).cast("double") / 1000000).as("sum_charge"),
        (sum(qtyC).cast("double") / 100 / count(lit(1))).as("avg_qty"),
        (sum(priceC).cast("double") / 100 / count(lit(1))).as("avg_price"),
        (sum(discC).cast("double") / 100 / count(lit(1))).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  val q1PricingSql: String =
    """SELECT l_returnflag, l_linestatus,
      | CAST(SUM(qty_c) AS DOUBLE)/100 AS sum_qty,
      | CAST(SUM(price_c) AS DOUBLE)/100 AS sum_base_price,
      | CAST(SUM(price_c * (100 - disc_c)) AS DOUBLE)/10000 AS sum_disc_price,
      | CAST(SUM(price_c * (100 - disc_c) * (100 + tax_c)) AS DOUBLE)/1000000 AS sum_charge,
      | CAST(SUM(qty_c) AS DOUBLE)/100/COUNT(*) AS avg_qty,
      | CAST(SUM(price_c) AS DOUBLE)/100/COUNT(*) AS avg_price,
      | CAST(SUM(disc_c) AS DOUBLE)/100/COUNT(*) AS avg_disc,
      | COUNT(*) AS count_order
      |FROM (
      |  SELECT l_returnflag, l_linestatus,
      |    CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qty_c,
      |    CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_c,
      |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_c
      |  FROM lineitem
      |  WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00')
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Shipping-priority-style revenue top-k (B2). Customer dim broadcast. */
  def q3TopK(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey", "o_orderdate")
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") > ts("1998-01-01 00:00:00"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    // no broadcast hint on customer: it grows with the dataset (7.5M rows
    // at the 50x stress already made a forced broadcast the bottleneck);
    // size stats/AQE broadcast it while small and shuffle-join at scale
    li.join(ord.join(cust, col("o_custkey") === col("c_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"))
      .agg((sum(revC(col("l_extendedprice"), col("l_discount"))).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  val q3TopKSql: String =
    """SELECT l_orderkey, o_orderdate,
      | CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)/10000 AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_orderkey, o_orderdate
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  /** Local-supplier revenue by nation (B3); dims broadcast, facts shuffled. */
  def q5RegionRevenue(spark: SparkSession, d: String): DataFrame = {
    val region = Tables.region(spark, d).filter(col("r_name") === "ASIA")
    val nation = Tables.nation(spark, d)
    val supplier = Tables.supplier(spark, d)
    val cust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, d)
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(supplier.select("s_suppkey", "s_nationkey"),
        col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey") &&
                  col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg((sum(revC(col("l_extendedprice"), col("l_discount"))).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  val q5RegionRevenueSql: String =
    """SELECT n_name,
      | CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)/10000 AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey AND l_suppkey = s_suppkey
      |  AND c_nationkey = s_nationkey AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  /** Selective filter + single aggregate (B4): pure scan-pushdown showcase. */
  def q6FilterAgg(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
    li.filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1997-01-01 00:00:00") &&
              col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
              col("l_quantity") < 24)
      .agg((sum(cents(col("l_extendedprice")) * cents(col("l_discount"))).cast("double") / 10000).as("revenue"),
           count(lit(1)).as("n_items"))
  }

  val q6FilterAggSql: String =
    """SELECT
      | CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * CAST(floor(l_discount * 100 + 0.5) AS BIGINT)) AS DOUBLE)/10000 AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_discount >= 0.05 AND l_discount <= 0.07
      |  AND l_quantity < 24""".stripMargin

  /** Returned-item revenue ranking (B5). */
  def q10Returns(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
    val nation = Tables.nation(spark, d)
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
              col("o_orderdate") < ts("1997-01-01 00:00:00"))
      .select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, d)
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("c_custkey"), col("c_name"), col("c_acctbal"), col("n_name"))
      .agg((sum(revC(col("l_extendedprice"), col("l_discount"))).cast("double") / 10000).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)
  }

  val q10ReturnsSql: String =
    """SELECT c_custkey, c_name, c_acctbal, n_name,
      | CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)/10000 AS revenue
      |FROM customer JOIN orders ON c_custkey = o_custkey
      | JOIN lineitem ON l_orderkey = o_orderkey
      | JOIN nation ON c_nationkey = n_nationkey
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_returnflag = 'R'
      |GROUP BY c_custkey, c_name, c_acctbal, n_name
      |ORDER BY revenue DESC, c_custkey
      |LIMIT 20""".stripMargin

  /** A3: per-entity feature materialization — the reference's
    * `compute_feature` (reference compute.py:10) as one shuffle-once
    * aggregate over the raw table. */
  def featCustomerStats(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d)
      .groupBy(col("o_custkey").as("entity_id"))
      .agg(
        count(lit(1)).as("order_cnt"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100).as("total_spend"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100 / count(lit(1))).as("avg_spend"),
        max(col("o_totalprice")).as("max_spend"),
        min(col("o_totalprice")).as("min_spend"),
        min(col("o_orderdate")).as("first_order"),
        max(col("o_orderdate")).as("last_order"))
      .orderBy(col("entity_id"))
  }

  val featCustomerStatsSql: String =
    """SELECT o_custkey AS entity_id,
      | COUNT(*) AS order_cnt,
      | CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS total_spend,
      | CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100/COUNT(*) AS avg_spend,
      | MAX(o_totalprice) AS max_spend,
      | MIN(o_totalprice) AS min_spend,
      | MIN(o_orderdate) AS first_order,
      | MAX(o_orderdate) AS last_order
      |FROM orders
      |GROUP BY o_custkey
      |ORDER BY entity_id""".stripMargin

  /** A3 computed through the SQL-AS-DATA path: the statement a user
    * migrating from the reference would register as
    * `computation_logic` (reference models.py:25-42, compute.py:37 —
    * there `exec`'d against pandas; here handed to Catalyst via
    * [[graft.registry.FeatureDef.applySql]]'s `__THIS__` temp-view
    * substitution, so it predicate-pushes, prunes and codegens like
    * the Column twin). Gated against the SAME DuckDB oracle as
    * `feat_customer_stats`, certifying the string path hash-identical
    * to the Column-expression twin end to end. */
  val featSqlTextStmt: String =
    """SELECT o_custkey AS entity_id,
      | COUNT(*) AS order_cnt,
      | CAST(SUM(floor(o_totalprice * 100 + 0.5)) AS DOUBLE)/100 AS total_spend,
      | CAST(SUM(floor(o_totalprice * 100 + 0.5)) AS DOUBLE)/100/COUNT(*) AS avg_spend,
      | MAX(o_totalprice) AS max_spend,
      | MIN(o_totalprice) AS min_spend,
      | MIN(o_orderdate) AS first_order,
      | MAX(o_orderdate) AS last_order
      |FROM __THIS__
      |GROUP BY o_custkey
      |ORDER BY entity_id""".stripMargin

  def featSqlText(spark: SparkSession, d: String): DataFrame =
    graft.registry.FeatureDef.applySql(Tables.orders(spark, d), featSqlTextStmt)

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_pricing" -> q1Pricing _,
    "q3_topk" -> q3TopK _,
    "q5_region_revenue" -> q5RegionRevenue _,
    "q6_filter_agg" -> q6FilterAgg _,
    "q10_returns" -> q10Returns _,
    "feat_customer_stats" -> featCustomerStats _,
    "feat_sql_text" -> featSqlText _)

  val oracles: Map[String, String] = Map(
    "q1_pricing" -> q1PricingSql,
    "q3_topk" -> q3TopKSql,
    "q5_region_revenue" -> q5RegionRevenueSql,
    "q6_filter_agg" -> q6FilterAggSql,
    "q10_returns" -> q10ReturnsSql,
    "feat_customer_stats" -> featCustomerStatsSql,
    "feat_sql_text" -> featCustomerStatsSql)
}
