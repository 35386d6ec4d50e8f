package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** B33: regular-grid resampling with linear interpolation — the
  * gap-fill verb between A29's LOCF (step-function fill) and a model:
  * observations land on a per-group integer grid, missing grid points
  * fill by exact linear interpolation between the nearest observations
  * on both sides.
  *
  * Semantics (pinned):
  *  - The spine per group spans [min(t), max(t)] of its OWN
  *    observations, step 1 (callers discretize time to grid units —
  *    the cents convention applied to the time axis).
  *  - Interior gaps fill with v0 + (v1−v0)·((t−t0)/(t1−t0)) — each
  *    operand an exact-cast integer or an observed double, the chain
  *    single IEEE ops, bit-identical cross-engine (gated).
  *  - Points BEFORE the first / AFTER the last observation stay NULL:
  *    extrapolation is a modeling decision, LOCF is A29's verb.
  *  - `filled` marks interpolated points; observed points carry their
  *    own value with filled = false.
  *
  * Scale: the spine is generated per group from a 1-row-per-group
  * aggregate (sequence + explode — never a cross join against a
  * calendar table), and both fill directions ride ONE group-keyed
  * window partitioning (forward + backward frames over the same
  * Exchange+Sort). Grid cells per group are bounded by the group's own
  * span — the guard refuses a span that would explode a single group.
  */
object TimeSeriesOps {

  /** Fill a per-group integer-grid series. Input: one row per observed
    * (group, t, value) — duplicate (group, t) is refused loudly (which
    * observation wins is not this operator's decision). Output:
    * (group, t, value, filled) on the full grid. */
  def interpolateLinear(df: DataFrame, groupCol: String, tCol: String,
                        valueCol: String, maxSpan: Long = 10000000L): DataFrame = {
    val obs = df.select(col(groupCol).as("grp"),
      col(tCol).cast("long").as("t"), col(valueCol).cast("double").as("v"))
    val spine = obs.groupBy(col("grp"))
      .agg(min(col("t")).as("_mn"), max(col("t")).as("_mx"),
        count(lit(1)).as("_nobs"), count_distinct(col("t")).as("_ndis"))
      // both guards ride columns the sequence CONSUMES — a guard on a
      // column the final select drops would be pruned away by Catalyst
      // and never fire
      .select(col("grp"), when(col("_nobs") =!= col("_ndis"),
          raise_error(concat(lit("interpolateLinear: duplicate t within group "),
            col("grp").cast("string"))))
          .otherwise(col("_mn")).as("_mn"),
        when(col("_mx") - col("_mn") >= maxSpan,
          raise_error(concat(lit(s"interpolateLinear: group span exceeds " +
            s"maxSpan=$maxSpan grid cells — coarsen the grid: "),
            col("grp").cast("string"))))
          .otherwise(col("_mx")).as("_mx"))
      .select(col("grp"), explode(sequence(col("_mn"), col("_mx"))).as("t"))
    val w = Window.partitionBy(col("grp")).orderBy(col("t"))
    val fwd = w.rowsBetween(Window.unboundedPreceding, 0)
    val bwd = w.rowsBetween(0, Window.unboundedFollowing)
    val joined = spine.join(obs, Seq("grp", "t"), "left")
      .withColumn("_v0", last(col("v"), ignoreNulls = true).over(fwd))
      .withColumn("_t0",
        last(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(fwd))
      .withColumn("_v1", first(col("v"), ignoreNulls = true).over(bwd))
      .withColumn("_t1",
        first(when(col("v").isNotNull, col("t")), ignoreNulls = true).over(bwd))
    val interp = col("_v0") + (col("_v1") - col("_v0")) *
      ((col("t") - col("_t0")).cast("double") /
        (col("_t1") - col("_t0")).cast("double"))
    joined.select(col("grp"), col("t"),
      when(col("v").isNotNull, col("v"))
        .when(col("_v0").isNotNull && col("_v1").isNotNull, interp)
        .otherwise(lit(null).cast("double")).as("value"),
      (col("v").isNull && col("_v0").isNotNull && col("_v1").isNotNull)
        .as("filled"))
  }

  // ---------------------------------------------------------------- gate

  /** Gate `ts_interp`: daily revenue-cents per event type, with every
    * third grid day REMOVED from the observations (derive-the-gaps —
    * the fk_audit convention), then re-filled by interpolation. Day
    * index is exact (datediff from the epoch), cents exact, so the
    * interpolation chain is bit-reproducible. */
  def interpGate(spark: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(spark, d)
      .groupBy(col("event_type"),
        datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
          .cast("long").as("day_idx"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .filter(col("day_idx") % 3 =!= 1)
    interpolateLinear(daily, "event_type", "day_idx", "cents")
      .withColumnRenamed("grp", "event_type").withColumnRenamed("t", "day_idx")
      .orderBy(col("event_type"), col("day_idx"))
  }

  val interpSql: String =
    """WITH daily AS (
      |  SELECT event_type AS grp,
      |    CAST(datediff('day', DATE '1970-01-01', CAST(ts AS DATE)) AS BIGINT) AS t,
      |    CAST(SUM(CAST(floor(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) AS v
      |  FROM events
      |  GROUP BY 1, 2
      |  HAVING t % 3 <> 1),
      |spine AS (
      |  SELECT grp, unnest(generate_series(MIN(t), MAX(t))) AS t
      |  FROM daily GROUP BY grp),
      |j AS (
      |  SELECT s.grp, s.t, d.v,
      |    last_value(d.v IGNORE NULLS) OVER (PARTITION BY s.grp ORDER BY s.t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS v0,
      |    last_value(CASE WHEN d.v IS NOT NULL THEN s.t END IGNORE NULLS)
      |      OVER (PARTITION BY s.grp ORDER BY s.t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS t0,
      |    first_value(d.v IGNORE NULLS) OVER (PARTITION BY s.grp ORDER BY s.t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS v1,
      |    first_value(CASE WHEN d.v IS NOT NULL THEN s.t END IGNORE NULLS)
      |      OVER (PARTITION BY s.grp ORDER BY s.t
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS t1
      |  FROM spine s LEFT JOIN daily d ON s.grp = d.grp AND s.t = d.t)
      |SELECT grp AS event_type, t AS day_idx,
      |  CASE WHEN v IS NOT NULL THEN v
      |    WHEN v0 IS NOT NULL AND v1 IS NOT NULL THEN
      |      v0 + (v1 - v0) * (CAST(t - t0 AS DOUBLE) / CAST(t1 - t0 AS DOUBLE))
      |    ELSE NULL END AS value,
      |  (v IS NULL AND v0 IS NOT NULL AND v1 IS NOT NULL) AS filled
      |FROM j
      |ORDER BY event_type, day_idx""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ts_interp" -> interpGate _)

  val oracles: Map[String, String] = Map(
    "ts_interp" -> interpSql)
}
