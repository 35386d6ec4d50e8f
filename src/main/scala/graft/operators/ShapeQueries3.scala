package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4/12 plan shapes (SURVEY §2 B24/B28): the TPC-H Q21 pattern,
  * and (r12) the Q8 national-market-share pattern — which needs no
  * `partsupp` after all (the round-4 note lumped it with Q2/Q9/Q11/
  * Q16/Q20, but Q8's only tables are part/supplier/lineitem/orders/
  * customer/nation×2/region, all shipped). The remaining five really
  * do need `partsupp`.
  */
object ShapeQueries3 {

  private def ts(s: String): Column = to_timestamp(lit(s))

  /** B24: "sole blocking supplier" (TPC-H Q21 shape). For finished
    * orders, find lineitems whose supplier shipped strictly last among a
    * multi-supplier order — EXISTS a co-supplier on the order, NOT EXISTS
    * a co-supplier that shipped later — and count offending lineitems per
    * supplier. (True Q21 compares receipt vs commit dates; this schema
    * has only `l_shipdate`, so "blocking" = shipped strictly after every
    * co-supplier. The plan shape is identical: two self-correlations on
    * the fact table.)
    *
    * Scale: both correlations are keyed on `l_orderkey` — a LeftSemi and
    * a LeftAnti shuffled hash join with non-equi residuals inside the
    * key group (the B13 convention), never a nested loop over the fact.
    * Order keys distribute evenly (≤ 7 lineitems each), so there is no
    * skew; `supplier` broadcasts. At 100 TB this is three same-key
    * shuffles of a projected 3-column lineitem — AQE coalesces the
    * rest. */
  def q21WaitSole(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_shipdate"))
    val finished = Tables.orders(spark, d)
      .filter(col("o_orderstatus") === "F").select(col("o_orderkey"))
    val l1 = li.join(finished, col("l_orderkey") === col("o_orderkey"), "left_semi")
    val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("s2"))
    val l3 = li.select(col("l_orderkey").as("k3"), col("l_suppkey").as("s3"),
      col("l_shipdate").as("d3"))
    l1.join(l2, col("l_orderkey") === col("k2") && col("l_suppkey") =!= col("s2"),
        "left_semi")
      .join(l3, col("l_orderkey") === col("k3") && col("l_suppkey") =!= col("s3") &&
        col("d3") > col("l_shipdate"), "left_anti")
      .join(broadcast(Tables.supplier(spark, d).select(col("s_suppkey"), col("s_name"))),
        col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
  }

  val q21WaitSoleSql: String =
    """SELECT s_name, CAST(COUNT(*) AS BIGINT) AS numwait
      |FROM lineitem l1
      |JOIN orders   ON o_orderkey = l1.l_orderkey
      |JOIN supplier ON s_suppkey  = l1.l_suppkey
      |WHERE o_orderstatus = 'F'
      |  AND EXISTS (SELECT 1 FROM lineitem l2
      |              WHERE l2.l_orderkey = l1.l_orderkey
      |                AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM lineitem l3
      |                  WHERE l3.l_orderkey = l1.l_orderkey
      |                    AND l3.l_suppkey <> l1.l_suppkey
      |                    AND l3.l_shipdate > l1.l_shipdate)
      |GROUP BY s_name
      |ORDER BY numwait DESC, s_name""".stripMargin

  /** B28: national market share (TPC-H Q8 shape) — NATION_2's share of
    * ASIA-customer ECONOMY-part revenue by order year. The seven-table
    * star: lineitem is the only fact at 100 TB scale; part/customer/
    * supplier join keyed (stats decide broadcast — part and supplier
    * grow with SF), nation/region are forced broadcasts, the region
    * restriction is a LEFT SEMI (no payload columns survive it). The
    * conditional-share aggregate is the q14 convention: exact
    * cents-long sums on both engines, ONE final IEEE division. */
  def q8MarketShare(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d).select(
      col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
      col("l_extendedprice"), col("l_discount"))
    val econ = Tables.part(spark, d)
      .filter(col("p_type") === "ECONOMY").select(col("p_partkey"))
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= ts("1996-01-01 00:00:00") &&
        col("o_orderdate") < ts("1998-01-01 00:00:00"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).as("o_year"))
    val cust = Tables.customer(spark, d)
      .select(col("c_custkey"), col("c_nationkey"))
    val n1 = Tables.nation(spark, d)
      .select(col("n_nationkey").as("n1_key"), col("n_regionkey"))
    val asia = Tables.region(spark, d)
      .filter(col("r_name") === "ASIA").select(col("r_regionkey"))
    val sup = Tables.supplier(spark, d)
      .select(col("s_suppkey"), col("s_nationkey"))
    val n2 = Tables.nation(spark, d)
      .select(col("n_nationkey").as("n2_key"), col("n_name").as("supp_nation"))
    val rev = revC(col("l_extendedprice"), col("l_discount"))
    li.join(econ, col("l_partkey") === col("p_partkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n1), col("c_nationkey") === col("n1_key"))
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"),
        "left_semi")
      .join(sup, col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n2), col("s_nationkey") === col("n2_key"))
      .groupBy(col("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_2", rev)
          .otherwise(lit(0L))).cast("double") /
        sum(rev).cast("double")).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  val q8MarketShareSql: String =
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS o_year,
      | CAST(SUM(CASE WHEN n2.n_name = 'NATION_2'
      |     THEN CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))
      |     ELSE 0 END) AS DOUBLE)
      |  / CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |       * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT)))
      |     AS DOUBLE) AS mkt_share
      |FROM lineitem
      |JOIN part      ON p_partkey = l_partkey
      |JOIN orders    ON o_orderkey = l_orderkey
      |JOIN customer  ON c_custkey = o_custkey
      |JOIN nation n1 ON n1.n_nationkey = c_nationkey
      |JOIN region    ON r_regionkey = n1.n_regionkey
      |JOIN supplier  ON s_suppkey = l_suppkey
      |JOIN nation n2 ON n2.n_nationkey = s_nationkey
      |WHERE p_type = 'ECONOMY' AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1
      |ORDER BY o_year""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_wait_sole" -> q21WaitSole _,
    "q8_market_share" -> q8MarketShare _)

  val oracles: Map[String, String] = Map(
    "q21_wait_sole" -> q21WaitSoleSql,
    "q8_market_share" -> q8MarketShareSql)
}
