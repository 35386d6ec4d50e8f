package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A30: interval (range) join — purchase attribution against the views
  * that preceded each purchase by at most 7 days.
  *
  * The naive form is a non-equi join (`v.ts BETWEEN p.ts - 7d AND p.ts`),
  * which Spark plans as a broadcast-nested-loop per user unless an equi
  * key is present. The scalable shape used here is the classic
  * bucket-by-window-length trick: quantize time into buckets exactly one
  * window wide, emit each view into its own bucket AND the next one
  * (a purchase at most 7 days later lands in one of those two), and join
  * on `(user_id, bucket)` with the precise range as a residual filter.
  *
  * Scale properties: the probe side fans out exactly 2x (never data- or
  * window-dependent), the join is a keyed equi-join (shuffle-partitioned
  * on (user_id, bucket), AQE-splittable), and the purchase side is not
  * exploded at all. At 100 TB this is the difference between a
  * per-user nested loop and an ordinary shuffled hash join.
  *
  * Semantics mirror the reference's raw-event ingestion surface
  * (reference main.py:117 event rows; compute.py aggregates per entity):
  * an attribution window is the canonical feature a store derives from
  * such logs. Comparisons run on epoch micros in BOTH engines (epoch_us
  * in DuckDB, unix_micros here) so the parquet ns->us truncation can
  * never flip a boundary. Aggregates are order-independent only
  * (COUNT + MAX) so the cross-engine hash is exact.
  */
object IntervalJoin {
  private val WeekUs = 7L * 86400L * 1000000L

  def attribViews7d(spark: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(spark, d)
    // Purchases keep their single native bucket. Micros are positive for
    // this dataset (2020s), so long `div` == floor division here.
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("pus"))
      .withColumn("wk", expr(s"pus div ${WeekUs}L"))
    // Each view covers its own bucket and the next: a purchase within
    // (v, v + 7d] falls in bucket wk(v) or wk(v)+1, never further.
    val views = ev.filter(col("event_type") === "view")
      .select(col("user_id").as("v_user"),
        unix_micros(col("ts")).as("vus"), col("value"))
      .withColumn("wk0", expr(s"vus div ${WeekUs}L"))
      .select(col("v_user"), col("vus"), col("value"),
        explode(array(col("wk0"), col("wk0") + 1L)).as("v_wk"))
    purchases
      .join(views,
        purchases("user_id") === views("v_user") &&
          purchases("wk") === views("v_wk") &&
          views("vus") >= purchases("pus") - WeekUs &&
          views("vus") < purchases("pus"),
        "left")
      .groupBy(col("event_id"))
      .agg(count(col("vus")).as("n_views_7d"),
        max(col("value")).as("max_view_value"))
      .orderBy(col("event_id"))
  }

  val attribViews7dSql: String =
    s"""WITH p AS (
       |  SELECT event_id, user_id, epoch_us(ts) AS pus
       |  FROM events WHERE event_type = 'purchase'),
       | v AS (
       |  SELECT user_id, epoch_us(ts) AS vus, value
       |  FROM events WHERE event_type = 'view')
       |SELECT p.event_id,
       |  COUNT(v.vus) AS n_views_7d,
       |  MAX(v.value) AS max_view_value
       |FROM p LEFT JOIN v
       |  ON v.user_id = p.user_id
       | AND v.vus >= p.pus - ${WeekUs} AND v.vus < p.pus
       |GROUP BY p.event_id
       |ORDER BY p.event_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "attrib_views_7d" -> attribViews7d _)

  val oracles: Map[String, String] = Map(
    "attrib_views_7d" -> attribViews7dSql)
}
