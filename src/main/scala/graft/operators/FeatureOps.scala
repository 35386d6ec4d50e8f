package graft.operators

import graft.Tables
import graft.functions.Exact._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Feature-store operators (SURVEY §2 A4–A12): the reference's versioned
  * materialization + latest-version serving (reference main.py:236-321,
  * models.py:45-81) re-expressed as window functions, pivots and a
  * shuffle-once as-of join.
  *
  * Scale notes: every window partitions by an entity key (user_id /
  * orderkey) — no global single-partition windows. Global statistics
  * (min/max/mean/std) are computed with a 1-row aggregate cross-joined
  * (auto-broadcast) rather than an empty-partitionBy window, which would
  * serialize 100 TB through one task. The as-of join is the union-sort
  * trick: one shuffle by entity, no per-row range probe fan-out.
  */
object FeatureOps {
  private val eventTypes = Seq("click", "view", "purchase", "signup", "error")

  /** A4: per-entity categorical feature vector via conditional aggregation. */
  def featEventCounts(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    val typeCounts = eventTypes.map(t =>
      count(when(col("event_type") === t, lit(1))).as(s"n_$t"))
    ev.groupBy(col("user_id").as("entity_id"))
      .agg(typeCounts.head, typeCounts.tail :+
        count(lit(1)).as("n_total") :+
        dbl(sum(dec6(col("value")))).as("total_value"): _*)
      .orderBy(col("entity_id"))
  }

  val featEventCountsSql: String = {
    val cases = eventTypes.map(t =>
      s" COUNT(CASE WHEN event_type = '$t' THEN 1 END) AS n_$t,").mkString("\n")
    s"""SELECT user_id AS entity_id,
       |$cases
       | COUNT(*) AS n_total,
       | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value
       |FROM events
       |GROUP BY user_id
       |ORDER BY entity_id""".stripMargin
  }

  /** A5: latest-active-version resolution (reference main.py:269-283):
    * entity=user, feature=event_type, version timestamp=ts. */
  def featLatestVersion(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id").as("entity_id"), col("event_type").as("feature_name"),
        col("value"), col("ts").as("computed_at"))
      .orderBy(col("entity_id"), col("feature_name"))
  }

  val featLatestVersionSql: String =
    """SELECT user_id AS entity_id, event_type AS feature_name, value, CAST(ts AS TIMESTAMP) AS computed_at
      |FROM (SELECT user_id, event_type, value, ts,
      |        row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
      |      FROM events)
      |WHERE rn = 1
      |ORDER BY entity_id, feature_name""".stripMargin

  /** A6: feature-vector assembly (reference main.py:236): wide pivot of the
    * latest value per (entity, feature). */
  def featVectorPivot(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val latest = Tables.events(spark, d)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
    val vecCols = eventTypes.map(t =>
      max(when(col("event_type") === t, col("value"))).as(s"f_$t"))
    latest.groupBy(col("user_id").as("entity_id"))
      .agg(vecCols.head, vecCols.tail: _*)
      .orderBy(col("entity_id"))
  }

  val featVectorPivotSql: String = {
    val cases = eventTypes.map(t =>
      s" MAX(CASE WHEN event_type = '$t' THEN value END) AS f_$t").mkString(",\n")
    s"""WITH latest AS (
       |  SELECT user_id, event_type, value,
       |         row_number() OVER (PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) AS rn
       |  FROM events)
       |SELECT user_id AS entity_id,
       |$cases
       |FROM latest WHERE rn = 1
       |GROUP BY user_id
       |ORDER BY entity_id""".stripMargin
  }

  /** A7: point-in-time (as-of) join via the union-sort trick: tag order
    * rows and event rows, sort each entity partition by time once, and
    * carry the last-seen event value forward — one shuffle, no range-probe
    * fan-out, skew-safe under AQE. */
  def featPitJoin(spark: SparkSession, d: String): DataFrame = {
    val asof = expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0, CAST(o_orderkey % 30 AS INT),0,0,0)")
    val o = Tables.orders(spark, d)
      .select(col("o_custkey").as("user_id"), asof.as("pt"),
        col("o_orderkey"), lit(0).as("is_event"),
        lit(null).cast("long").as("eid"), lit(null).cast("double").as("ev_value"))
    val e = Tables.events(spark, d)
      .select(col("user_id"), col("ts").as("pt"),
        lit(null).cast("long").as("o_orderkey"), lit(1).as("is_event"),
        col("event_id").as("eid"), col("value").as("ev_value"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("pt"), col("is_event").desc, col("eid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.unionByName(o)
      .withColumn("last_event_value", last(col("ev_value"), ignoreNulls = true).over(w))
      .filter(col("is_event") === 0 && col("last_event_value").isNotNull)
      .select(col("o_orderkey"), col("user_id").as("entity_id"),
        col("pt").as("asof_ts"), col("last_event_value"))
      .orderBy(col("o_orderkey"))
  }

  val featPitJoinSql: String =
    """WITH o AS (
      |  SELECT o_orderkey, o_custkey,
      |         TIMESTAMP '2024-01-01 00:00:00' + (o_orderkey % 30) * INTERVAL 1 DAY AS asof_ts
      |  FROM orders),
      |j AS (
      |  SELECT o.o_orderkey, o.o_custkey, o.asof_ts, e.value,
      |         row_number() OVER (PARTITION BY o.o_orderkey ORDER BY e.ts DESC, e.event_id DESC) AS rn
      |  FROM o JOIN events e ON e.user_id = o.o_custkey AND e.ts <= o.asof_ts)
      |SELECT o_orderkey, o_custkey AS entity_id, asof_ts, value AS last_event_value
      |FROM j WHERE rn = 1
      |ORDER BY o_orderkey""".stripMargin

  /** A8: min-max scaling. Global stats via 1-row agg + broadcast cross
    * join (never an empty-partition window). */
  def featMinmaxScale(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).select("c_custkey", "c_acctbal")
    val stats = c.agg(min(col("c_acctbal")).as("mn"), max(col("c_acctbal")).as("mx"))
    c.crossJoin(broadcast(stats))
      .select(col("c_custkey").as("entity_id"),
        when(col("mx") === col("mn"), lit(0.0))
          .otherwise((col("c_acctbal") - col("mn")) / (col("mx") - col("mn")))
          .as("acctbal_scaled"))
      .orderBy(col("entity_id"))
  }

  val featMinmaxScaleSql: String =
    """WITH s AS (SELECT MIN(c_acctbal) AS mn, MAX(c_acctbal) AS mx FROM customer)
      |SELECT c_custkey AS entity_id,
      |       CASE WHEN mx = mn THEN 0.0 ELSE (c_acctbal - mn) / (mx - mn) END AS acctbal_scaled
      |FROM customer, s
      |ORDER BY entity_id""".stripMargin

  /** A9: z-score standardization with exact-decimal sums so both engines
    * derive bit-identical mean/variance. */
  def featZscore(spark: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(spark, d).select("c_custkey", "c_acctbal")
    val stats = c.agg(
      dbl(sum(dec2(col("c_acctbal")))).as("s"),
      dbl(sum(dec2(col("c_acctbal")) * dec2(col("c_acctbal")))).as("ssq"),
      count(lit(1)).as("n"))
    c.crossJoin(broadcast(stats))
      .select(col("c_custkey").as("entity_id"),
        ((col("c_acctbal") - col("s") / col("n")) /
          sqrt((col("ssq") - col("s") * col("s") / col("n")) / (col("n") - 1)))
          .as("acctbal_z"))
      .orderBy(col("entity_id"))
  }

  val featZscoreSql: String =
    """WITH s AS (
      |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS s,
      |         CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2)) * CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS ssq,
      |         COUNT(*) AS n
      |  FROM customer)
      |SELECT c_custkey AS entity_id,
      |       (c_acctbal - s / n) / sqrt((ssq - s * s / n) / (n - 1)) AS acctbal_z
      |FROM customer, s
      |ORDER BY entity_id""".stripMargin

  /** A10: rolling per-entity window feature (last-3-events sum/count). */
  def featRollingAgg(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    Tables.events(spark, d)
      .select(col("event_id"), col("user_id"),
        dbl(sum(dec6(col("value"))).over(w)).as("roll_sum3"),
        count(lit(1)).over(w).as("roll_cnt3"))
      .orderBy(col("event_id"))
  }

  val featRollingAggSql: String =
    """SELECT event_id, user_id,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS DOUBLE) AS roll_sum3,
      | COUNT(*) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS BETWEEN 2 PRECEDING AND CURRENT ROW) AS roll_cnt3
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** A11: gap-based sessionization (30-min inactivity) — lag + cumulative
    * sum inside one entity-partitioned window. */
  def featSessionize(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(w))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > 1800000000L, lit(1))
          .otherwise(lit(0)))
      .withColumn("session_id", sum(col("is_new")).over(cum))
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("ts")).as("session_start"),
        max(col("ts")).as("session_end"))
      .orderBy(col("user_id"), col("session_id"))
  }

  val featSessionizeSql: String =
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |         CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
      |                OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 1800000000 THEN 1 ELSE 0 END AS is_new
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |s AS (
      |  SELECT user_id, ts, event_id,
      |         CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_id
      |  FROM g)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |       CAST(MIN(ts) AS TIMESTAMP) AS session_start, CAST(MAX(ts) AS TIMESTAMP) AS session_end
      |FROM s GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  /** A28: rolling 7-day window feature — a time-RANGE frame (not row
    * count): every event sees the sum/count of its user's events in the
    * trailing 7 days. Ordered on epoch micros so the frame bound is an
    * exact integer interval in both engines (RANGE over timestamps
    * directly would hit engine-specific interval semantics); peers with
    * equal timestamps enter the frame together in both engines by RANGE
    * definition. */
  def featRolling7d(spark: SparkSession, d: String): DataFrame = {
    val sevenDaysUs = 7L * 24 * 3600 * 1000000
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("us"))
      .rangeBetween(-sevenDaysUs, Window.currentRow)
    Tables.events(spark, d)
      .withColumn("us", unix_micros(col("ts")))
      .select(col("event_id"), col("user_id"),
        dbl(sum(dec6(col("value"))).over(w)).as("roll_sum_7d"),
        count(lit(1)).over(w).as("roll_cnt_7d"))
      .orderBy(col("event_id"))
  }

  val featRolling7dSql: String =
    """SELECT event_id, user_id,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS roll_sum_7d,
      | COUNT(*) OVER w AS roll_cnt_7d
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** A29: last-observation-carried-forward imputation — the standard
    * gap-fill for sparse feature streams. `error` events carry no
    * usable value (nullified), and each row takes the latest preceding
    * non-null value in its user's timeline: `last(..., ignoreNulls)`
    * over an unbounded-preceding rows frame ≡ DuckDB's
    * `last_value(x IGNORE NULLS)`. Leading rows before any observation
    * stay NULL in both engines. */
  def featLocf(spark: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.events(spark, d)
      .withColumn("v", when(col("event_type") =!= "error", col("value")))
      .select(col("event_id"), col("user_id"), col("event_type"),
        last(col("v"), ignoreNulls = true).over(w).as("value_filled"))
      .orderBy(col("event_id"))
  }

  val featLocfSql: String =
    """SELECT event_id, user_id, event_type,
      | last_value(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
      |   OVER (PARTITION BY user_id ORDER BY ts, event_id
      |         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS value_filled
      |FROM events
      |ORDER BY event_id""".stripMargin

  /** A12: tumbling daily aggregates per event type. */
  def featTumbling1d(spark: SparkSession, d: String): DataFrame = {
    Tables.events(spark, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("n"),
        dbl(sum(dec6(col("value")))).as("total"))
      .orderBy(col("event_type"), col("day"))
  }

  val featTumbling1dSql: String =
    """SELECT event_type, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day, COUNT(*) AS n,
      | CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total
      |FROM events
      |GROUP BY event_type, date_trunc('day', ts)
      |ORDER BY event_type, day""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "feat_event_counts" -> featEventCounts _,
    "feat_latest_version" -> featLatestVersion _,
    "feat_vector_pivot" -> featVectorPivot _,
    "feat_pit_join" -> featPitJoin _,
    "feat_minmax_scale" -> featMinmaxScale _,
    "feat_zscore" -> featZscore _,
    "feat_rolling_agg" -> featRollingAgg _,
    "feat_sessionize" -> featSessionize _,
    "feat_tumbling_1d" -> featTumbling1d _,
    "feat_rolling_7d" -> featRolling7d _,
    "feat_locf" -> featLocf _)

  val oracles: Map[String, String] = Map(
    "feat_event_counts" -> featEventCountsSql,
    "feat_latest_version" -> featLatestVersionSql,
    "feat_vector_pivot" -> featVectorPivotSql,
    "feat_pit_join" -> featPitJoinSql,
    "feat_minmax_scale" -> featMinmaxScaleSql,
    "feat_zscore" -> featZscoreSql,
    "feat_rolling_agg" -> featRollingAggSql,
    "feat_sessionize" -> featSessionizeSql,
    "feat_tumbling_1d" -> featTumbling1dSql,
    "feat_rolling_7d" -> featRolling7dSql,
    "feat_locf" -> featLocfSql)
}
