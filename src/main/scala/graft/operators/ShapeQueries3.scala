package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-4 plan shapes (SURVEY §2 B24): the TPC-H Q21 pattern — the last
  * canonical TPC-H query shape expressible on this schema (Q2/Q8/Q9/Q11/
  * Q16/Q20 all need `partsupp`, which the test data does not ship).
  */
object ShapeQueries3 {

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

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_wait_sole" -> q21WaitSole _)

  val oracles: Map[String, String] = Map(
    "q21_wait_sole" -> q21WaitSoleSql)
}
