package graft

import org.apache.spark.sql.functions._

class TrainingSetSpec extends SparkSpec {
  test("training-set assembly: PIT features + static aggregates, no leakage") {
    import spark.implicits._
    def t(s: String) = java.sql.Timestamp.valueOf(s)
    val labels = Seq(
      (1L, t("2024-01-01 12:00:00"), 1.0),
      (2L, t("2024-01-01 09:00:00"), 0.0))
      .toDF("entity_id", "label_ts", "label")
    val events = Seq(
      (1L, t("2024-01-01 10:00:00"), 1L, 5.0),
      (1L, t("2024-01-01 13:00:00"), 2L, 99.0), // future — must not leak
      (2L, t("2024-01-01 08:00:00"), 3L, 7.0))
      .toDF("entity_id", "ts", "seq", "value")
    val entities = Seq((1L, 3), (2L, 8)).toDF("entity_id", "n_orders")

    val ts = TrainingSet.assemble(labels, events, entities).collect()
      .map(r => r.getAs[Long]("entity_id") -> r).toMap
    assert(ts.size === 2)
    assert(ts(1L).getAs[Double]("last_event_value") === 5.0) // not 99.0
    assert(ts(2L).getAs[Double]("last_event_value") === 7.0)
    assert(ts(1L).getAs[Int]("n_orders") === 3)
    assert(ts(1L).getAs[Double]("label") === 1.0)
  }
}
