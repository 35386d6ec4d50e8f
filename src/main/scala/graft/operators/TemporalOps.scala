package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Calendar + sequence operators (SURVEY §2 A15–A17): date-part rollups,
  * next-event lookahead (lead), and adjacent-document edit distance —
  * rounding out the window/date/string function families. */
object TemporalOps {

  /** A15: monthly order aggregation via date parts. */
  def ordersByMonth(spark: SparkSession, d: String): DataFrame = {
    Tables.orders(spark, d)
      .groupBy(year(col("o_orderdate")).as("yr"), month(col("o_orderdate")).as("mo"))
      .agg(count(lit(1)).as("n_orders"),
        (sum(cents(col("o_totalprice"))).cast("double") / 100).as("revenue"))
      .orderBy(col("yr"), col("mo"))
  }

  val ordersByMonthSql: String =
    """SELECT EXTRACT(YEAR FROM o_orderdate) AS yr, EXTRACT(MONTH FROM o_orderdate) AS mo,
      | COUNT(*) AS n_orders,
      | CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS DOUBLE)/100 AS revenue
      |FROM orders
      |GROUP BY 1, 2
      |ORDER BY yr, mo""".stripMargin

  /** A16: next-event lookahead per user — lead() with a total ordering. */
  def featNextEvent(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        lead(col("event_type"), 1).over(w).as("next_type"),
        (unix_micros(lead(col("ts"), 1).over(w)) - unix_micros(col("ts")))
          .as("micros_to_next"))
      .orderBy(col("event_id"))
  }

  val featNextEventSql: String =
    """SELECT event_id, user_id, event_type,
      | lead(event_type, 1) OVER w AS next_type,
      | lead(epoch_us(ts), 1) OVER w - epoch_us(ts) AS micros_to_next
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** A17: adjacent-document edit distance (levenshtein on 40-char
    * prefixes — a bounded-cost string-similarity probe). */
  def textEditdistAdjacent(spark: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(spark, d)
      .select(col("doc_id"), substring(col("text"), 1, 40).as("p"))
    val next = docs.select((col("doc_id") - 1).as("doc_id"), col("p").as("p_next"))
    docs.join(next, Seq("doc_id"))
      .select(col("doc_id"), levenshtein(col("p"), col("p_next")).as("editdist"))
      .orderBy(col("doc_id"))
  }

  val textEditdistAdjacentSql: String =
    """SELECT a.doc_id, levenshtein(substr(a.text, 1, 40), substr(b.text, 1, 40)) AS editdist
      |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
      |ORDER BY a.doc_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_by_month" -> ordersByMonth _,
    "feat_next_event" -> featNextEvent _,
    "text_editdist_adjacent" -> textEditdistAdjacent _)

  val oracles: Map[String, String] = Map(
    "orders_by_month" -> ordersByMonthSql,
    "feat_next_event" -> featNextEventSql,
    "text_editdist_adjacent" -> textEditdistAdjacentSql)
}
