package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Second batch of plan-shape coverage queries (SURVEY §2 B16–B20): the
  * remaining TPC-H join/scalar shapes expressible on this schema —
  * dual-aliased dim join (Q7), outer-join count distribution (Q13),
  * scalar-max selection over an aggregate (Q15), correlated-average
  * rewrite (Q17), and global-scalar + anti-join (Q22).
  *
  * Exactness convention: every money/quantity predicate that TPC-H states
  * against a floating AVG is restated as an integer-cents inequality
  * (`x < s/n  ⟺  x_cents·n < s_cents`) so both engines evaluate the
  * identical integer comparison — no order-dependent FP average ever
  * feeds a filter. Money sums are cents-long sums (CoreQueries.q1Pricing
  * convention) with one final IEEE divide.
  */
object ShapeQueries2 {
  private def ts(s: String) = to_timestamp(lit(s))

  /** B16: nation-pair trade volume by ship year — TPC-H Q7's shape: the
    * nation dim joins TWICE under different roles (supplier nation,
    * customer nation), both broadcast; the pair predicate is a
    * disjunction over the two role columns evaluated after both dim
    * joins; facts shuffle only on their join keys. */
  def q7Volume(spark: SparkSession, d: String): DataFrame = {
    val n1 = Tables.nation(spark, d)
      .select(col("n_nationkey").as("s_nk"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(spark, d)
      .select(col("n_nationkey").as("c_nk"), col("n_name").as("cust_nation"))
    val supp = Tables.supplier(spark, d).select("s_suppkey", "s_nationkey")
    val cust = Tables.customer(spark, d).select("c_custkey", "c_nationkey")
    val ord = Tables.orders(spark, d).select("o_orderkey", "o_custkey")
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1998-01-01 00:00:00"))
      .select(col("l_orderkey"), col("l_suppkey"),
        year(col("l_shipdate")).cast("long").as("l_year"),
        revC(col("l_extendedprice"), col("l_discount")).as("_rev"))
    li.join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("s_nationkey") === col("s_nk"))
      .join(broadcast(n2), col("c_nationkey") === col("c_nk"))
      .filter(
        (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
        (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg((sum(col("_rev")).cast("double") / 10000).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  val q7VolumeSql: String =
    """SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
      | CAST(year(l_shipdate) AS BIGINT) AS l_year,
      | CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)/10000 AS revenue
      |FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
      | JOIN orders ON o_orderkey = l_orderkey
      | JOIN customer ON c_custkey = o_custkey
      | JOIN nation n1 ON s_nationkey = n1.n_nationkey
      | JOIN nation n2 ON c_nationkey = n2.n_nationkey
      |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      |    OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
      |GROUP BY supp_nation, cust_nation, l_year
      |ORDER BY supp_nation, cust_nation, l_year""".stripMargin

  /** B17: customer order-count distribution — TPC-H Q13's shape. The
    * textbook form outer-joins customer×orders then counts twice; here
    * orders aggregates FIRST (map-side combinable count per custkey) and
    * the outer join carries one row per customer — strictly less data
    * through the join at any scale, same result by construction. */
  def q13Distribution(spark: SparkSession, d: String): DataFrame = {
    val cnt = Tables.orders(spark, d)
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("cnt"))
    Tables.customer(spark, d).select("c_custkey")
      .join(cnt, col("c_custkey") === col("o_custkey"), "left_outer")
      .select(coalesce(col("cnt"), lit(0L)).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  val q13DistributionSql: String =
    """SELECT c_count, COUNT(*) AS custdist
      |FROM (
      |  SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
      |  FROM customer LEFT OUTER JOIN orders
      |    ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      |  GROUP BY c_custkey)
      |GROUP BY c_count
      |ORDER BY custdist DESC, c_count DESC""".stripMargin

  /** B18: top-revenue supplier(s) — TPC-H Q15's shape: an aggregate
    * (revenue per supplier) consumed twice, once for the rows and once
    * reduced to a scalar MAX that selects them. The per-supplier cents
    * totals are longs, so the max-equality is an exact integer match in
    * both engines; the single-row max side broadcasts. */
  def q15TopSupplier(spark: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= ts("1996-01-01 00:00:00") &&
              col("l_shipdate") < ts("1996-04-01 00:00:00"))
      .groupBy(col("l_suppkey"))
      .agg(sum(revC(col("l_extendedprice"), col("l_discount"))).as("total_c"))
    val mx = rev.agg(max(col("total_c")).as("max_c"))
    rev.join(broadcast(mx), col("total_c") === col("max_c"))
      .join(Tables.supplier(spark, d).select("s_suppkey", "s_name"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"),
        (col("total_c").cast("double") / 10000).as("total_revenue"))
      .orderBy(col("s_suppkey"))
  }

  val q15TopSupplierSql: String =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |        * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS total_c
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_suppkey, s_name, CAST(total_c AS DOUBLE)/10000 AS total_revenue
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_c = (SELECT MAX(total_c) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  /** B19: small-quantity revenue — TPC-H Q17's shape: a scalar subquery
    * correlated per part (`l_quantity < 0.2 * avg(l_quantity)`) rewritten
    * as aggregate-then-rejoin. The FP average never materializes: with
    * s = Σ qty_cents and n the row count per part, the predicate is the
    * exact integer inequality 5·qty_cents·n < s. The filtered part dim
    * broadcasts into BOTH the detail scan and the aggregate input, so
    * only the ~1/brand-count slice of lineitem ever shuffles. */
  def q17AvgQty(spark: SparkSession, d: String): DataFrame = {
    val pk = Tables.part(spark, d)
      .filter(col("p_brand") === "Brand#23" && col("p_type") === "STANDARD")
      .select("p_partkey")
    val li = Tables.lineitem(spark, d)
      .select(col("l_partkey"), cents(col("l_quantity")).as("qc"),
        cents(col("l_extendedprice")).as("pc"))
      .join(broadcast(pk), col("l_partkey") === col("p_partkey"))
    val ag = li.groupBy(col("l_partkey").as("k"))
      .agg(sum(col("qc")).as("s"), count(lit(1)).as("n"))
    li.join(ag, col("l_partkey") === col("k"))
      .filter(col("qc") * 5 * col("n") < col("s"))
      .agg((sum(col("pc")).cast("double") / 700).as("avg_yearly"))
  }

  val q17AvgQtySql: String =
    """WITH pk AS (SELECT p_partkey FROM part
      |            WHERE p_brand = 'Brand#23' AND p_type = 'STANDARD'),
      | li AS (SELECT l_partkey,
      |          CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS qc,
      |          CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS pc
      |        FROM lineitem JOIN pk ON l_partkey = p_partkey),
      | ag AS (SELECT l_partkey AS k, SUM(qc) AS s, COUNT(*) AS n
      |        FROM li GROUP BY l_partkey)
      |SELECT CAST(SUM(pc) AS DOUBLE)/700 AS avg_yearly
      |FROM li JOIN ag ON l_partkey = k
      |WHERE qc * 5 * n < s""".stripMargin

  /** B20: idle high-balance customers by nation — TPC-H Q22's shape: a
    * global scalar (average positive account balance) broadcast against
    * every row, plus a NOT EXISTS anti-join on orders. The scalar
    * comparison is exact: bal > s/n  ⟺  bal_cents·n > s_cents, all
    * longs. Negative balances floor-round identically in both engines
    * (same IEEE multiply, same floor). */
  def q22GlobalAcct(spark: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_nationkey"),
        cents(col("c_acctbal")).as("bc"))
    val pos = cust.filter(col("bc") > 0)
      .agg(sum(col("bc")).as("s"), count(lit(1)).as("n"))
    cust.crossJoin(broadcast(pos))
      .filter(col("bc") * col("n") > col("s"))
      .join(Tables.orders(spark, d).select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("numcust"),
        (sum(col("bc")).cast("double") / 100).as("totacctbal"))
      .orderBy(col("c_nationkey"))
  }

  val q22GlobalAcctSql: String =
    """WITH cust AS (SELECT c_custkey, c_nationkey,
      |                CAST(floor(c_acctbal * 100 + 0.5) AS BIGINT) AS bc
      |              FROM customer),
      | pos AS (SELECT SUM(bc) AS s, CAST(COUNT(*) AS BIGINT) AS n
      |         FROM cust WHERE bc > 0)
      |SELECT c_nationkey, COUNT(*) AS numcust,
      | CAST(SUM(bc) AS DOUBLE)/100 AS totacctbal
      |FROM cust, pos
      |WHERE bc * n > s
      |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_nationkey
      |ORDER BY c_nationkey""".stripMargin

  /** B21: CUBE aggregation with grouping_id — all four grouping
    * combinations of (event_type, year) in ONE pass: Spark expands the
    * cube before the aggregate, so partial aggregation still combines
    * map-side per grouping set (never four scans). `grouping_id()`
    * disambiguates a real NULL dim from a rolled-up one; value sums ride
    * the dec6 exact path (feat_tumbling_1d convention). */
  def eventsCube(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Exact.{dbl, dec6}
    Tables.events(spark, d)
      .withColumn("yr", year(col("ts")).cast("long"))
      .cube(col("event_type"), col("yr"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dec6(col("value")))).as("total"),
        grouping_id().as("gid"))
      .orderBy(col("gid"), col("event_type"), col("yr"))
  }

  val eventsCubeSql: String =
    """SELECT event_type, CAST(year(ts) AS BIGINT) AS yr, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total,
      | CAST(GROUPING(event_type) * 2 + GROUPING(year(ts)) AS BIGINT) AS gid
      |FROM events
      |GROUP BY CUBE (event_type, year(ts))
      |ORDER BY gid, event_type NULLS FIRST, yr NULLS FIRST""".stripMargin

  /** B22: INTERSECT set semantics — users who both clicked and
    * purchased. Spark plans intersect as aggregate + left-semi join
    * (distinct set semantics in both engines); never a pairwise op. */
  def usersIntersect(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    ev.filter(col("event_type") === "click").select(col("user_id"))
      .intersect(ev.filter(col("event_type") === "purchase").select(col("user_id")))
      .orderBy(col("user_id"))
  }

  val usersIntersectSql: String =
    """SELECT user_id FROM events WHERE event_type = 'click'
      |INTERSECT
      |SELECT user_id FROM events WHERE event_type = 'purchase'
      |ORDER BY user_id""".stripMargin

  /** B23: ordered string aggregation — the distinct sources per language
    * as one sorted comma-joined string. `collect_set` is unordered by
    * contract, so determinism comes from `array_sort` BEFORE the join —
    * mirroring DuckDB's `string_agg(DISTINCT ... ORDER BY ...)`. */
  def langSourceAgg(spark: SparkSession, d: String): DataFrame = {
    Tables.documents(spark, d)
      .groupBy(col("lang"))
      .agg(
        concat_ws(",", array_sort(collect_set(col("source")))).as("sources"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("lang"))
  }

  val langSourceAggSql: String =
    """SELECT lang,
      | string_agg(DISTINCT source, ',' ORDER BY source) AS sources,
      | CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q7_volume" -> q7Volume _,
    "q13_distribution" -> q13Distribution _,
    "q15_top_supplier" -> q15TopSupplier _,
    "q17_avg_qty" -> q17AvgQty _,
    "q22_global_acct" -> q22GlobalAcct _,
    "events_cube" -> eventsCube _,
    "users_intersect" -> usersIntersect _,
    "lang_source_agg" -> langSourceAgg _)

  val oracles: Map[String, String] = Map(
    "q7_volume" -> q7VolumeSql,
    "q13_distribution" -> q13DistributionSql,
    "q15_top_supplier" -> q15TopSupplierSql,
    "q17_avg_qty" -> q17AvgQtySql,
    "q22_global_acct" -> q22GlobalAcctSql,
    "events_cube" -> eventsCubeSql,
    "users_intersect" -> usersIntersectSql,
    "lang_source_agg" -> langSourceAggSql)
}
