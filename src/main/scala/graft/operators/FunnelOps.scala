package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B36: k-step ordered funnel — the Amplitude/Mixpanel product verb
  * generalizing A26's fixed 2-step conversion: per user, the EARLIEST
  * completion of an ordered event-type sequence, step timestamps
  * exposed so drop-off localizes to a stage.
  *
  * Semantics (pinned): greedy-earliest matching — t₁ = min ts of
  * step 1, tᵢ = min ts of step i STRICTLY after tᵢ₋₁ (a same-instant
  * next step does not chain; ties inside one step resolve by min).
  * Greedy-earliest is complete for unwindowed funnels: if any
  * assignment of events completes the sequence, the greedy one does
  * (each greedy prefix ends no later than any other assignment's).
  * `steps_completed` counts the reached prefix; reached timestamps
  * stay, unreached are NULL.
  *
  * Scale: the corpus is scanned ONCE — a pushed-down isin filter keeps
  * only funnel-relevant events, and the k−1 step rounds run over that
  * localCheckpointed slice (each a user-keyed join → per-user MIN; no
  * window, no per-user event list, hot users cost only their rows; k
  * is the QUERY's size, not the data's).
  */
object FunnelOps {

  /** Per-user funnel trace: (user, t_1 … t_k, steps_completed). Users
    * who never fire step 1 are absent. */
  def funnel(events: DataFrame, userCol: String, typeCol: String,
             tsCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "steps must be non-empty")
    require(steps.distinct.size == steps.size,
      s"repeated step types unsupported (greedy-earliest would chain a " +
        s"single event run ambiguously): $steps")
    val ev = events.select(col(userCol).as("_u"), col(typeCol).as("_t"),
      col(tsCol).as("_ts"))
      .filter(col("_t").isin(steps: _*))
      .localCheckpoint()
    var reached = ev.filter(col("_t") === steps.head)
      .groupBy(col("_u")).agg(min(col("_ts")).as("t_1"))
    for (i <- 2 to steps.size) {
      val prev = s"t_${i - 1}"
      val next = ev.filter(col("_t") === steps(i - 1))
        .join(reached.select(col("_u"), col(prev)), Seq("_u"))
        .filter(col("_ts") > col(prev))
        .groupBy(col("_u")).agg(min(col("_ts")).as(s"t_$i"))
      reached = reached.join(next, Seq("_u"), "left")
    }
    val completed = (2 to steps.size).foldLeft(lit(1L)) { (acc, i) =>
      acc + when(col(s"t_$i").isNotNull, 1L).otherwise(0L)
    }
    reached.select(col("_u").as(userCol) +:
      (1 to steps.size).map(i => col(s"t_$i")) :+
      completed.as("steps_completed"): _*)
  }

  /** Stage-level rollup: users reaching each step + conversion from
    * the previous stage (single IEEE division — the A26 convention;
    * a zero-denominator stage pins NULL, the repo-wide convention,
    * never the 0/0 NaN a raw division would produce). */
  def funnelSummary(trace: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k=$k")
    val counts = trace.agg(
      count(lit(1)).as("n_1"),
      (2 to k).map(i => count(col(s"t_$i")).as(s"n_$i")): _*)
    val rows = (1 to k).map { i =>
      struct(lit(i).as("step"), col(s"n_$i").as("n_reached"),
        (if (i == 1) lit(1.0)
         else when(col(s"n_${i - 1}") === 0, lit(null).cast("double"))
           .otherwise(col(s"n_$i").cast("double") /
             col(s"n_${i - 1}").cast("double")))
          .as("conv_from_prev"))
    }
    counts.select(explode(array(rows: _*)).as("_s")).select("_s.*")
  }

  // ---------------------------------------------------------------- gate

  /** Gate `funnel_steps`: the view → click → purchase trace per user
    * (greedy-earliest, strict ordering), plus the stage rollup folded
    * in DuckDB identically. */
  def funnelGate(spark: SparkSession, d: String): DataFrame =
    funnel(Tables.events(spark, d), "user_id", "event_type", "ts",
      Seq("view", "click", "purchase"))
      .orderBy(col("user_id"))

  val funnelSql: String =
    """WITH ev AS (SELECT user_id AS u, event_type AS t, ts FROM events),
      |s1 AS (SELECT u, MIN(ts) AS t_1 FROM ev WHERE t = 'view' GROUP BY u),
      |s2 AS (SELECT ev.u, MIN(ev.ts) AS t_2
      |       FROM ev JOIN s1 ON ev.u = s1.u
      |       WHERE ev.t = 'click' AND ev.ts > s1.t_1 GROUP BY ev.u),
      |s3 AS (SELECT ev.u, MIN(ev.ts) AS t_3
      |       FROM ev JOIN s2 ON ev.u = s2.u
      |       WHERE ev.t = 'purchase' AND ev.ts > s2.t_2 GROUP BY ev.u)
      |SELECT s1.u AS user_id, s1.t_1, s2.t_2, s3.t_3,
      |  CAST(1 + (CASE WHEN s2.t_2 IS NOT NULL THEN 1 ELSE 0 END)
      |    + (CASE WHEN s3.t_3 IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |    AS steps_completed
      |FROM s1 LEFT JOIN s2 ON s1.u = s2.u LEFT JOIN s3 ON s1.u = s3.u
      |ORDER BY user_id""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "funnel_steps" -> funnelGate _)

  val oracles: Map[String, String] = Map(
    "funnel_steps" -> funnelSql)
}
