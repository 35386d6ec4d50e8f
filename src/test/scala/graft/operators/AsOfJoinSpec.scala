package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class AsOfJoinSpec extends SparkSpec {
  test("generalized asOf matches the oracle-checked pit query") {
    val probe = Tables.orders(spark, sf)
      .select(col("o_orderkey"),
        col("o_custkey").as("user_id"),
        expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0,0,0, CAST(o_orderkey % 30 AS INT),0,0,0)").as("ts"))
    val build = Tables.events(spark, sf)
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val got = AsOfJoin.asOf(probe, build, "user_id", "ts", "event_id", Seq("value"))
      .select(col("o_orderkey"), col("asof_value").as("last_event_value"))
    val want = graft.operators.FeatureOps.featPitJoin(spark, sf)
      .select("o_orderkey", "last_event_value")
    assert(want.except(got).count() === 0)
    assert(got.except(want).count() === 0)
  }

  test("asOf picks the latest build row, not an arbitrary one") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val probe = Seq((1L, t("2024-01-01 12:00:00"), "p1")).toDF("e", "ts", "tag")
    val build = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, 10.0),
      (1L, t("2024-01-01 11:00:00"), 2L, 20.0),
      (1L, t("2024-01-01 12:00:00"), 3L, 30.0),   // same-ts: visible
      (1L, t("2024-01-01 13:00:00"), 4L, 40.0))   // future: invisible
      .toDF("e", "ts", "seq", "v")
    val out = AsOfJoin.asOf(probe, build, "e", "ts", "seq", Seq("v")).collect()
    assert(out.length === 1)
    assert(out(0).getAs[Double]("asof_v") === 30.0)
  }
}
