package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Extended analytics coverage (SURVEY §2 B6–B9): promo-share conditional
  * aggregation over `part`, large-order semi-join-style HAVING, supplier
  * revenue ranking, and JSON property extraction from `events.props` —
  * the semi-structured-column operator family.
  */
object ExtendedQueries {

  /** B6: promotion revenue share — broadcast `part` dim, conditional agg. */
  def q14Promo(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = Tables.part(spark, d).select("p_partkey", "p_type")
    val rev = revC(col("l_extendedprice"), col("l_discount"))
    // part grows with the dataset — no forced broadcast; stats decide
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        (lit(100.0) * sum(when(col("p_type") === "ECONOMY", rev).otherwise(lit(0L))).cast("double") /
          sum(rev).cast("double")).as("promo_revenue_pct"),
        count(lit(1)).as("n_items"))
  }

  val q14PromoSql: String =
    """SELECT
      | 100.0 * CAST(SUM(CASE WHEN p_type = 'ECONOMY'
      |     THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
      |     ELSE 0 END) AS DOUBLE)
      |   / CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE) AS promo_revenue_pct,
      | COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin

  /** B7: large orders — aggregate-then-filter (HAVING) plus order join. */
  def q18LargeOrders(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_quantity")
    val big = li.groupBy(col("l_orderkey"))
      .agg((sum(cents(col("l_quantity"))).cast("double") / 100).as("total_qty"))
      .filter(col("total_qty") > 150)
    val ord = Tables.orders(spark, d)
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice")
    big.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "total_qty")
      .orderBy(col("total_qty").desc, col("o_orderkey"))
  }

  val q18LargeOrdersSql: String =
    """SELECT o_orderkey, o_custkey, o_orderdate, o_totalprice, total_qty
      |FROM (SELECT l_orderkey, CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS total_qty
      |      FROM lineitem GROUP BY l_orderkey
      |      HAVING CAST(SUM(CAST(floor(l_quantity * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100 > 150)
      | JOIN orders ON l_orderkey = o_orderkey
      |ORDER BY total_qty DESC, o_orderkey""".stripMargin

  /** B8: supplier revenue ranking. The sort key (revenue, s_suppkey) is
    * unique per row, so dense_rank ≡ row_number — computed with RankOps'
    * two-phase range-partitioned numbering instead of a global
    * single-partition window, which would serialize the supplier
    * dimension through one task at 100× scale. */
  def supplierRank(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select("l_suppkey", "l_extendedprice", "l_discount")
    val sup = Tables.supplier(spark, d).select("s_suppkey", "s_name", "s_nationkey")
    val nat = Tables.nation(spark, d).select("n_nationkey", "n_name")
    val byS = li.groupBy(col("l_suppkey"))
      .agg((sum(revC(col("l_extendedprice"), col("l_discount"))).cast("double") / 10000).as("revenue"))
    val joined = byS.join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_name"), col("n_name"), col("revenue"))
    RankOps.twoPhaseRowNumber(joined, "rnk", 32,
        col("revenue").desc, col("s_suppkey"))
      .select("s_suppkey", "s_name", "n_name", "revenue", "rnk")
      .orderBy(col("rnk"), col("s_suppkey"))
  }

  val supplierRankSql: String =
    """SELECT s_suppkey, s_name, n_name, revenue,
      |       dense_rank() OVER (ORDER BY revenue DESC, s_suppkey) AS rnk
      |FROM (SELECT l_suppkey, CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)/10000 AS revenue
      |      FROM lineitem GROUP BY l_suppkey)
      | JOIN supplier ON l_suppkey = s_suppkey
      | JOIN nation ON s_nationkey = n_nationkey
      |ORDER BY rnk, s_suppkey""".stripMargin

  /** B9: semi-structured extraction — per-user aggregate of a JSON
    * property from `events.props` (stays in codegen; at scale the JSON
    * parse is the scan-side CPU cost, so it's projected once). */
  def featJsonExtract(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .select(col("user_id"),
        get_json_object(col("props"), "$.k").cast("long").as("k"))
      .groupBy(col("user_id").as("entity_id"))
      .agg(sum(col("k")).as("k_sum"), max(col("k")).as("k_max"),
        count(when(col("k") > 50, lit(1))).as("n_high"))
      .orderBy(col("entity_id"))
  }

  val featJsonExtractSql: String =
    """SELECT user_id AS entity_id,
      | CAST(SUM(k) AS BIGINT) AS k_sum, MAX(k) AS k_max,
      | COUNT(CASE WHEN k > 50 THEN 1 END) AS n_high
      |FROM (SELECT user_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k FROM events)
      |GROUP BY user_id
      |ORDER BY entity_id""".stripMargin


  /** B10: hierarchical rollup totals over documents (source → lang). */
  def docsRollup(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .rollup(col("source"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("total_chars"),
        (sum(col("n_chars")).cast("double") / count(lit(1))).as("avg_chars"))
      .orderBy(col("source").asc_nulls_first, col("lang").asc_nulls_first)
  }

  val docsRollupSql: String =
    """SELECT source, lang, COUNT(*) AS n_docs, CAST(SUM(n_chars) AS BIGINT) AS total_chars,
      | CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS avg_chars
      |FROM documents
      |GROUP BY ROLLUP (source, lang)
      |ORDER BY source NULLS FIRST, lang NULLS FIRST""".stripMargin

  /** B11: discrete percentiles per event type (portable selection — no
    * interpolation, raw stored doubles pass through exactly). Computed
    * by [[PercentileOps.percentileDisc]] — exact count-banded selection,
    * bit-identical to the built-in `percentile_disc` (spec-asserted) but
    * WITHOUT its per-group value buffer, which with ~5 event types would
    * hold a fifth of the fact table per buffer at 100× (an executor OOM,
    * not a slowdown). The distinct-user/count aggregates stay one
    * ordinary map-side-combinable pass. */
  def aggPercentiles(spark: SparkSession, d: String): DataFrame = {
    import spark.implicits._
    val ev = Tables.events(spark, d).select("event_type", "value", "user_id")
    val pct = PercentileOps.percentileDisc(ev, "event_type", "value",
      Seq(0.5, 0.9, 0.99))
    val pctDf = pct.keys.map(_._1).toSeq.distinct
      .map(g => (g, pct((g, 0.5)), pct((g, 0.9)), pct((g, 0.99))))
      .toDF("event_type", "p50", "p90", "p99")
    ev.groupBy(col("event_type"))
      .agg(countDistinct(col("user_id")).as("n_users"), count(lit(1)).as("n"))
      // left join: a group whose values are all NULL has no percentile
      // entry but must still appear (with NULL p50/p90/p99), matching
      // the built-in percentile_disc and the unchanged DuckDB oracle
      .join(broadcast(pctDf), Seq("event_type"), "left")
      .select(col("event_type"), col("p50"), col("p90"), col("p99"),
        col("n_users"), col("n"))
      .orderBy(col("event_type"))
  }

  val aggPercentilesSql: String =
    """SELECT event_type,
      | quantile_disc(value, 0.5) AS p50,
      | quantile_disc(value, 0.9) AS p90,
      | quantile_disc(value, 0.99) AS p99,
      | COUNT(DISTINCT user_id) AS n_users,
      | COUNT(*) AS n
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** B25: the scale-safe percentile path. B11's `percentile_disc` buffers
    * every group's values in the aggregation buffer — with ~5 event types
    * each buffer holds ~a fifth of the fact table, an executor OOM at
    * 100×, not a slowdown. `approx_percentile` keeps a bounded
    * Greenwald-Khanna sketch per group (O(1/accuracy · log n) entries)
    * with guaranteed rank error ≤ n/accuracy = n/10⁴;
    * `approx_count_distinct` likewise replaces the exact distinct's
    * per-group expand with O(1) HLL registers. ApproxPercentileSpec
    * measures the actual rank error vs the exact form on the real events
    * table. No SQL oracle: sketch merge order is engine-internal, so this
    * rides the driver's rows-only check (SparkEntry.rowsOnlyQueries);
    * B11 stays as the hash-exact oracle form at small SF. */
  def aggPercentilesApprox(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .groupBy(col("event_type"))
      .agg(
        expr("approx_percentile(value, array(0.5, 0.9, 0.99), 10000)").as("pcts"),
        approx_count_distinct(col("user_id")).as("n_users_approx"),
        count(lit(1)).as("n"))
      .select(col("event_type"),
        col("pcts")(0).as("p50"), col("pcts")(1).as("p90"), col("pcts")(2).as("p99"),
        col("n_users_approx"), col("n"))
      .orderBy(col("event_type"))
  }

  /** B12: anti-join — customers with no order above 300k (left_anti keeps
    * the build side small: the filtered orders projection). */
  def custNoBigOrder(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d).select("c_custkey", "c_name", "c_acctbal")
    val big = Tables.orders(spark, d)
      .filter(col("o_totalprice") > 300000).select("o_custkey")
    cust.join(big, col("c_custkey") === col("o_custkey"), "left_anti")
      .orderBy(col("c_custkey"))
  }

  val custNoBigOrderSql: String =
    """SELECT c_custkey, c_name, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_promo" -> q14Promo _,
    "q18_large_orders" -> q18LargeOrders _,
    "supplier_rank" -> supplierRank _,
    "feat_json_extract" -> featJsonExtract _,
    "docs_rollup" -> docsRollup _,
    "agg_percentiles" -> aggPercentiles _,
    "agg_percentiles_approx" -> aggPercentilesApprox _,
    "cust_no_big_order" -> custNoBigOrder _)

  val oracles: Map[String, String] = Map(
    "q14_promo" -> q14PromoSql,
    "q18_large_orders" -> q18LargeOrdersSql,
    "supplier_rank" -> supplierRankSql,
    "feat_json_extract" -> featJsonExtractSql,
    "docs_rollup" -> docsRollupSql,
    "agg_percentiles" -> aggPercentilesSql,
    "cust_no_big_order" -> custNoBigOrderSql)
}
