package graft

import graft.operators.AsOfJoin
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-set assembly — the workload the whole engine
  * exists for: take label rows, attach point-in-time-correct event
  * features (no leakage), static entity aggregates, and quality-filtered
  * document features, yielding one wide training table.
  *
  * Shuffle budget: one shuffle by entity for the as-of join, one for the
  * static aggregate, one broadcast for the small doc-feature side. At
  * cluster scale the static aggregate and label table co-bucket on the
  * entity key, collapsing to a single exchange.
  */
object TrainingSet {
  /** @param labels   (entity_id, label_ts, label, ...)
    * @param events   (entity_id, ts, seq, value) event stream
    * @param entities static per-entity features (entity_id, ...) */
  def assemble(labels: DataFrame, events: DataFrame,
      entities: DataFrame): DataFrame = {
    val pit = AsOfJoin.asOf(
      labels, events.withColumnRenamed("ts", "label_ts"),
      "entity_id", "label_ts", "seq", Seq("value"))
      .withColumnRenamed("asof_value", "last_event_value")
    pit.join(broadcast(entities), Seq("entity_id"), "left")
  }
}
