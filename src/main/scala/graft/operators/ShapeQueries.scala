package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Plan-shape coverage queries (SURVEY §2 B13–B15): the three join/
  * predicate shapes the B-suite didn't yet exercise — EXISTS semi-join
  * with a non-equi residual, conditional aggregation over a fact-fact
  * join, and a disjunctive multi-column predicate that must evaluate
  * post-join without blocking pushdown of the conjunct prefix.
  *
  * Arithmetic follows the integer-cents convention (CoreQueries.q1Pricing):
  * money sums are long sums over rounded cents, one final IEEE divide.
  */
object ShapeQueries {

  /** B13: late-shipped order counts by priority — TPC-H Q4's shape: an
    * EXISTS subquery that plans as a LEFT SEMI join on the order key
    * with the `l_shipdate > o_orderdate` residual evaluated inside the
    * join, so the orders scan is filtered once and lineitem is never
    * aggregated. */
  def q4PriorityExists(spark: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(spark, d)
      .filter(col("o_orderdate") >= to_timestamp(lit("1996-01-01 00:00:00")) &&
              col("o_orderdate") < to_timestamp(lit("1997-01-01 00:00:00")))
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val li = Tables.lineitem(spark, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
        col("o_orderkey") === col("l_orderkey") &&
        col("l_shipdate") > col("o_orderdate"), "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("order_count"))
      .orderBy(col("o_orderpriority"))
  }

  val q4PriorityExistsSql: String =
    """SELECT o_orderpriority, COUNT(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** B14: priority mix per return flag — TPC-H Q12's shape: a fact-fact
    * equi-join feeding CASE-WHEN conditional aggregation, so one shuffle
    * produces both counters (no per-branch scans). */
  def q12PriorityClass(spark: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(spark, d)
      .filter(col("l_shipdate") >= to_timestamp(lit("1997-01-01 00:00:00")) &&
              col("l_shipdate") < to_timestamp(lit("1998-01-01 00:00:00")))
      .select("l_orderkey", "l_returnflag")
    val ord = Tables.orders(spark, d).select("o_orderkey", "o_orderpriority")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority") === "1-URGENT" ||
                 col("o_orderpriority") === "2-HIGH", 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(col("o_orderpriority") =!= "1-URGENT" &&
                 col("o_orderpriority") =!= "2-HIGH", 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy(col("l_returnflag"))
  }

  val q12PriorityClassSql: String =
    """SELECT l_returnflag,
      | CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH'
      |               THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
      | CAST(SUM(CASE WHEN o_orderpriority <> '1-URGENT' AND o_orderpriority <> '2-HIGH'
      |               THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
      |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY l_returnflag
      |ORDER BY l_returnflag""".stripMargin

  /** B15: disjunctive brand/quantity revenue — TPC-H Q19's shape: an OR
    * of conjunct groups across both join sides. The part dim broadcasts
    * (q14 convention); the disjunction evaluates post-join while the
    * l_quantity range bound (the disjuncts' common envelope) still
    * pushes to the lineitem scan. */
  def q19Disjunct(spark: SparkSession, d: String): DataFrame = {
    import graft.functions.Exact.cents
    val qtyC = cents(col("l_quantity"))
    val priceC = cents(col("l_extendedprice"))
    val discC = cents(col("l_discount"))
    val li = Tables.lineitem(spark, d)
      // common envelope of the three disjunct ranges -> scan-level prune
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 40)
      .select(col("l_partkey"), col("l_quantity"),
        (priceC * (lit(100L) - discC)).as("_rev"), qtyC.as("_qc"))
    val part = Tables.part(spark, d).select("p_partkey", "p_brand", "p_type")
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#13" && col("l_quantity") >= 1 && col("l_quantity") <= 20) ||
        (col("p_brand") === "Brand#23" && col("l_quantity") >= 10 && col("l_quantity") <= 30) ||
        (col("p_type") === "ECONOMY" && col("l_quantity") >= 20 && col("l_quantity") <= 40))
      .agg((sum(col("_rev")).cast("double") / 10000).as("revenue"),
        count(lit(1)).as("n_items"))
  }

  val q19DisjunctSql: String =
    """SELECT
      | CAST(SUM(CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT)
      |           * (100 - CAST(floor(l_discount * 100 + 0.5) AS BIGINT))) AS DOUBLE)/10000 AS revenue,
      | COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE ((p_brand = 'Brand#13' AND l_quantity BETWEEN 1 AND 20)
      |    OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 30)
      |    OR (p_type = 'ECONOMY' AND l_quantity BETWEEN 20 AND 40))""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q4_priority_exists" -> q4PriorityExists _,
    "q12_priority_class" -> q12PriorityClass _,
    "q19_disjunct" -> q19Disjunct _)

  val oracles: Map[String, String] = Map(
    "q4_priority_exists" -> q4PriorityExistsSql,
    "q12_priority_class" -> q12PriorityClassSql,
    "q19_disjunct" -> q19DisjunctSql)
}
