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

  /** A26: view→purchase conversion funnel — one combinable per-user
    * aggregate (first view ts, last purchase ts as conditional MIN/MAX),
    * one scalar rollup. No window, no self-join: the classic funnel
    * reduces to two conditional extremes per user, which map-side
    * combines at any scale. */
  def eventFunnel(spark: SparkSession, d: String): DataFrame = {
    val perUser = Tables.events(spark, d)
      .groupBy(col("user_id"))
      .agg(
        min(when(col("event_type") === "view", col("ts"))).as("first_view"),
        max(when(col("event_type") === "purchase", col("ts"))).as("last_purchase"))
      .filter(col("first_view").isNotNull)
    perUser.agg(
      count(lit(1)).as("n_viewers"),
      sum(when(col("last_purchase") > col("first_view"), 1L).otherwise(0L))
        .as("n_converted"))
      .select(col("n_viewers"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_viewers")).as("conv_rate"))
  }

  val eventFunnelSql: String =
    """WITH u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts END) AS first_view,
      |    MAX(CASE WHEN event_type = 'purchase' THEN ts END) AS last_purchase
      |  FROM events GROUP BY user_id),
      | f AS (
      |  SELECT COUNT(*) AS n_viewers,
      |    CAST(SUM(CASE WHEN last_purchase > first_view THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_converted
      |  FROM u WHERE first_view IS NOT NULL)
      |SELECT n_viewers, n_converted,
      |  CAST(n_converted AS DOUBLE)/n_viewers AS conv_rate
      |FROM f""".stripMargin

  /** A27: next-day retention by activity day — distinct (user, day)
    * pairs self-joined one day forward. The distinct is the only
    * corpus-sized shuffle; the self-join is keyed on (user, day), never
    * all-pairs, and days stay TIMESTAMP (date_trunc) for cross-engine
    * dtype stability (feat_tumbling_1d convention). */
  def userRetention1d(spark: SparkSession, d: String): DataFrame = {
    val days = Tables.events(spark, d)
      .select(col("user_id"), date_trunc("day", col("ts")).as("day"))
      .distinct()
    val next = days.select(col("user_id"),
      (col("day") - expr("INTERVAL 1 DAY")).as("day"))
    days.join(next, Seq("user_id", "day"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("retained"))
      .orderBy(col("day"))
  }

  val userRetention1dSql: String =
    """WITH days AS (
      |  SELECT DISTINCT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day
      |  FROM events)
      |SELECT a.day, COUNT(*) AS retained
      |FROM days a JOIN days b
      |  ON a.user_id = b.user_id AND b.day = a.day + INTERVAL 1 DAY
      |GROUP BY a.day
      |ORDER BY a.day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "orders_by_month" -> ordersByMonth _,
    "feat_next_event" -> featNextEvent _,
    "text_editdist_adjacent" -> textEditdistAdjacent _,
    "event_funnel" -> eventFunnel _,
    "user_retention_1d" -> userRetention1d _)

  val oracles: Map[String, String] = Map(
    "orders_by_month" -> ordersByMonthSql,
    "feat_next_event" -> featNextEventSql,
    "text_editdist_adjacent" -> textEditdistAdjacentSql,
    "event_funnel" -> eventFunnelSql,
    "user_retention_1d" -> userRetention1dSql)
}
