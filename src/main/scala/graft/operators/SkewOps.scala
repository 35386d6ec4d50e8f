package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew-resilient aggregation (SURVEY §5): two-phase salted aggregation
  * for heavy-hitter keys where AQE's skew handling doesn't apply (it only
  * splits join partitions, not aggregation partitions).
  *
  * Phase 1 groups on (key, salt) — hot keys fan out over `salts` reducers
  * — then phase 2 merges the per-salt partials. Only algebraic aggregates
  * (sum/count/min/max) can be re-merged; that is exactly what feature
  * materialization uses. With map-side partial aggregation Spark already
  * absorbs most skew, so this is the escape hatch for the residual
  * reduce-side hot key at 100 TB (e.g. one user with 10^9 events).
  */
object SkewOps {

  /** Skew PROFILE of a join/aggregation key — the measurement that
    * decides whether [[saltedCountSum]] (or a salted join) is needed at
    * all, instead of guessing: the exact top-k heaviest keys plus the
    * whole-column concentration numbers. One map-side-combinable keyed
    * count, then a k-bounded TakeOrdered and a second small aggregate
    * over the key-count frame — nothing data-sized leaves the
    * executors. Output is ONE row per top-k key with the shared
    * totals: (key, key_n, rank, n_rows, n_keys, max_over_mean) where
    * max_over_mean is the heaviest key's count over the mean key count
    * — the multiplier that says how unbalanced the hottest reduce
    * partition would be without salting (the same imbalance statistic
    * IvfIndex.stats reports for its lists). Ties rank by ascending key
    * string (pinned, the repo argmax convention). */
  def profileKey(df: DataFrame, key: String, topK: Int = 10): DataFrame = {
    require(topK > 0, s"topK $topK must be positive")
    val counts = df.groupBy(col(key).cast("string").as("key"))
      .agg(count(lit(1)).as("key_n"))
    val tot = counts.agg(
      sum("key_n").as("n_rows"), count(lit(1)).as("n_keys"),
      (max("key_n") / (sum("key_n") / count(lit(1)))).as("max_over_mean"))
    // TakeOrdered for the selection (per-partition top-k + an O(k)
    // merge — never a global sort of the keys frame); the row_number
    // window then runs over k rows only, a benign single partition
    val top = counts.orderBy(col("key_n").desc, col("key")).limit(topK)
    top
      .withColumn("rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .orderBy(col("key_n").desc, col("key"))))
      .join(broadcast(tot))
  }

  /** Salted per-key count + sum over `valueCol`. Result is identical to
    * `df.groupBy(key).agg(count, sum)` for any salt count. */
  def saltedCountSum(df: DataFrame, key: String, valueCol: String,
      salts: Int = 32): DataFrame = {
    val salted = df.withColumn("_salt", pmod(spark_partition_id() + monotonically_increasing_id(), lit(salts)))
    salted
      .groupBy(col(key), col("_salt"))
      .agg(count(lit(1)).as("_n"), sum(col(valueCol)).as("_s"))
      .groupBy(col(key))
      .agg(sum(col("_n")).as("n"), sum(col("_s")).as("total"))
  }

  // ---- gated harness entry -------------------------------------------------

  /** Gated entry (`skew_profile`): the profiler against ground truth —
    * top-10 heaviest event users plus the concentration numbers, every
    * value either an exact integer or the same IEEE division sequence
    * on identical longs (max / (sum / count)); ties exercised by the
    * string-key rank rule. DuckDB re-derives with its own window +
    * totals (sums cast to BIGINT — DuckDB's HUGEINT would change the
    * hashed dtype). */
  def skewProfile(spark: SparkSession, d: String): DataFrame =
    profileKey(graft.Tables.events(spark, d), "user_id", topK = 10)
      .withColumn("rank", col("rank").cast("long"))

  val skewProfileSql: String =
    """WITH c AS (
      |  SELECT CAST(user_id AS VARCHAR) AS key, count(*) AS key_n
      |  FROM events GROUP BY 1),
      |t AS (
      |  SELECT CAST(sum(key_n) AS BIGINT) AS n_rows, count(*) AS n_keys,
      |    CAST(max(key_n) AS DOUBLE) /
      |      (CAST(sum(key_n) AS DOUBLE) / count(*)) AS max_over_mean
      |  FROM c),
      |r AS (
      |  SELECT key, key_n,
      |    row_number() OVER (ORDER BY key_n DESC, key) AS rank
      |  FROM c)
      |SELECT r.key, r.key_n, r.rank, t.n_rows, t.n_keys, t.max_over_mean
      |FROM r, t WHERE r.rank <= 10""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "skew_profile" -> skewProfile _)

  val oracles: Map[String, String] = Map(
    "skew_profile" -> skewProfileSql)
}
