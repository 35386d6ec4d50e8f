package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
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
}
