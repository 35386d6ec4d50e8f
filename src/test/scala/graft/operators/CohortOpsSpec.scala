package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B26/B27 cohort + transition rollups: matrix invariants the oracle
  * hash can't articulate (diagonal = cohort size, retention never
  * exceeds the cohort, transition total = events − one per user), and
  * the no-single-partition-window plan guard. */
class CohortOpsSpec extends SparkSpec {

  test("cohort_retention: offset-0 row equals the cohort size and every " +
    "later offset is bounded by it; offsets are non-negative") {
    val m = CohortOps.cohortRetention(spark, sf).collect()
    assert(m.nonEmpty)
    val byCohort = m.groupBy(_.getTimestamp(0))
    byCohort.foreach { case (wk, rows) =>
      val at = rows.map(r => r.getLong(1) -> r.getLong(2)).toMap
      assert(at.contains(0L), s"cohort $wk missing its own week")
      assert(at.keys.forall(_ >= 0L))
      assert(at.forall { case (_, n) => n <= at(0L) },
        s"cohort $wk retains more users than it has")
    }
    // cohort sizes partition the user population exactly
    val users = graft.Tables.events(spark, sf)
      .select(col("user_id")).distinct().count()
    assert(byCohort.values.map(_.filter(_.getLong(1) == 0L)
      .map(_.getLong(2)).sum).sum === users)
  }

  test("event_transitions: totals = events minus one per active user, " +
    "and the window never collapses to a single partition") {
    val t = CohortOps.eventTransitions(spark, sf)
    val events = graft.Tables.events(spark, sf)
    val total = t.agg(sum(col("n"))).collect()(0).getLong(0)
    val users = events.select(col("user_id")).distinct().count()
    assert(total === events.count() - users)
    val plan = t.queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"),
      "transition window must stay partitioned by user")
  }
}
