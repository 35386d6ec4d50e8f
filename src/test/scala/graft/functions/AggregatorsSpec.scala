package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

case class EvRow(user_id: Long, value: Double, event_id: Long)

class AggregatorsSpec extends SparkSpec {
  test("weighted mean matches a direct computation") {
    import spark.implicits._
    val ds = Tables.events(spark, sf)
      .select("user_id", "value", "event_id").as[EvRow]
    val wm = new Aggregators.WeightedMean[EvRow](_.value, r => (r.event_id % 5 + 1).toDouble)
    val got = ds.groupByKey(_.user_id).agg(wm.toColumn.name("wmean"))
      .collect().toMap
    val want = Tables.events(spark, sf)
      .groupBy("user_id")
      .agg((sum(col("value") * (col("event_id") % 5 + 1)) /
        sum(col("event_id") % 5 + 1)).as("wmean"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    assert(got.keySet === want.keySet)
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-9 * math.max(1.0, math.abs(want(k))))
    }
  }

  test("online variance matches var_samp") {
    import spark.implicits._
    val ds = Tables.events(spark, sf)
      .select("user_id", "value", "event_id").as[EvRow]
    val ov = new Aggregators.OnlineVariance[EvRow](_.value)
    val got = ds.groupByKey(_.user_id).agg(ov.toColumn.name("v")).collect().toMap
    val want = Tables.events(spark, sf).groupBy("user_id")
      .agg(var_samp(col("value")).as("v"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    got.foreach { case (k, v) =>
      assert(math.abs(v - want(k)) < 1e-6 * math.max(1.0, math.abs(want(k))))
    }
  }
}
