package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Cohort + sequence analytics over the event stream (SURVEY §2 B26/B27):
  * the weekly cohort-retention matrix and the event-transition
  * (first-order Markov) counts — the two behavioral rollups every
  * product-analytics deployment derives from an event table, and the
  * generalization of A27's fixed one-day retention to the full
  * cohort × offset triangle.
  *
  * Scale: `cohortRetention`'s only corpus-sized exchange is the
  * DISTINCT (user, week) projection (combinable — map-side partial
  * distinct); the cohort assignment (MIN week per user) and the
  * activity join both key on `user_id`, so AQE reuses/coalesces one
  * user-keyed shuffle, and the final matrix is (weeks × offsets)-sized
  * — KBs at any corpus. `eventTransitions` windows PARTITIONED BY
  * user (never a global window) and reduces straight to a
  * |event types|²-sized frame. Weeks stay TIMESTAMP (`date_trunc`)
  * for cross-engine dtype stability — the feat_tumbling_1d convention.
  */
object CohortOps {

  /** B26: weekly cohort retention — users bucketed by their FIRST
    * active week (the cohort), counted in every later week they remain
    * active, keyed by the week offset. Offsets divide exactly (both
    * sides are week-truncated), so the day-diff / 7 is exact in IEEE
    * and truncation-free in both engines. */
  def cohortRetention(spark: SparkSession, d: String): DataFrame = {
    val weeks = Tables.events(spark, d)
      .select(col("user_id"), date_trunc("week", col("ts")).as("wk"))
      .distinct()
    val cohort = weeks.groupBy(col("user_id"))
      .agg(min(col("wk")).as("cohort_wk"))
    weeks.join(cohort, Seq("user_id"))
      .groupBy(col("cohort_wk"),
        (datediff(col("wk"), col("cohort_wk")) / 7).cast("long")
          .as("wk_offset"))
      .agg(count(lit(1)).as("n_active"))
      .orderBy(col("cohort_wk"), col("wk_offset"))
  }

  val cohortRetentionSql: String =
    """WITH weeks AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', ts) AS TIMESTAMP) AS wk
      |  FROM events),
      |cohort AS (
      |  SELECT user_id, MIN(wk) AS cohort_wk FROM weeks GROUP BY user_id)
      |SELECT c.cohort_wk,
      |  CAST(datediff('day', c.cohort_wk, w.wk) // 7 AS BIGINT) AS wk_offset,
      |  COUNT(*) AS n_active
      |FROM weeks w JOIN cohort c ON w.user_id = c.user_id
      |GROUP BY 1, 2
      |ORDER BY cohort_wk, wk_offset""".stripMargin

  /** B27: event-type transition counts — consecutive event pairs per
    * user under the (ts, event_id) total order (the feat_next_event
    * ordering, unique per user, so lead() is deterministic), rolled up
    * to the (from, to) transition matrix. */
  def eventTransitions(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(spark, d)
      .select(col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .filter(col("to_type").isNotNull)
      .groupBy(col("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  val eventTransitionsSql: String =
    """SELECT from_type, to_type, COUNT(*) AS n
      |FROM (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type
      |ORDER BY from_type, to_type""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "cohort_retention" -> cohortRetention _,
    "event_transitions" -> eventTransitions _)

  val oracles: Map[String, String] = Map(
    "cohort_retention" -> cohortRetentionSql,
    "event_transitions" -> eventTransitionsSql)
}
