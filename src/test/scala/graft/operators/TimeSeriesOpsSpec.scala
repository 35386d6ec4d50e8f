package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TimeSeriesOpsSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: (String, Long, Double)*) =
    TimeSeriesOps.interpolateLinear(
      rows.toSeq.toDF("g", "t", "v"), "g", "t", "v")
      .collect()
      .map(r => (r.getString(0), r.getLong(1),
        if (r.isNullAt(2)) None else Some(r.getDouble(2)), r.getBoolean(3)))
      .sortBy(x => (x._1, x._2))

  test("interior gaps fill linearly; observed points pass through unfilled") {
    val got = run(("a", 0L, 10.0), ("a", 3L, 40.0), ("a", 4L, 0.0))
    assert(got.toSeq === Seq(
      ("a", 0L, Some(10.0), false),
      ("a", 1L, Some(20.0), true),
      ("a", 2L, Some(30.0), true),
      ("a", 3L, Some(40.0), false),
      ("a", 4L, Some(0.0), false)))
  }

  test("no extrapolation: the spine spans the group's own observations only") {
    val got = run(("a", 5L, 1.0), ("a", 7L, 3.0), ("b", 100L, 9.0))
    assert(got.filter(_._1 == "a").map(_._2).toSeq === Seq(5L, 6L, 7L))
    assert(got.filter(_._1 == "b").toSeq === Seq(("b", 100L, Some(9.0), false)))
  }

  test("observed NULL value at a grid point interpolates like a gap") {
    val df = Seq(("a", 0L, Some(2.0)), ("a", 1L, Option.empty[Double]),
      ("a", 2L, Some(4.0))).toDF("g", "t", "v")
    val got = TimeSeriesOps.interpolateLinear(df, "g", "t", "v")
      .orderBy("t").collect()
    assert(got(1).getDouble(2) === 3.0)
    assert(got(1).getBoolean(3))
  }

  test("duplicate t within a group refuses loudly") {
    val e = intercept[Exception] {
      run(("a", 1L, 1.0), ("a", 1L, 2.0), ("a", 5L, 3.0))
    }
    assert(e.getMessage.contains("duplicate t"))
  }

  test("a group span past maxSpan refuses loudly") {
    val df = Seq(("a", 0L, 1.0), ("a", 50L, 2.0)).toDF("g", "t", "v")
    val e = intercept[Exception] {
      TimeSeriesOps.interpolateLinear(df, "g", "t", "v", maxSpan = 10)
        .collect()
    }
    assert(e.getMessage.contains("maxSpan"))
  }

  test("gate: removed grid days come back filled, observed days exact") {
    val rows = TimeSeriesOps.interpGate(spark, sf)
    val filled = rows.filter(col("filled"))
    assert(filled.count() > 0)
    // every filled interior day sits on the removed lattice or a
    // day with no events at all; observed days are never flagged
    assert(rows.filter(col("filled") && col("value").isNull).count() === 0)
    val observedDays = graft.Tables.events(spark, sf)
      .select(datediff(to_date(col("ts")), lit("1970-01-01").cast("date"))
        .cast("long").as("d"), col("event_type"))
      .filter(col("d") % 3 =!= 1).distinct()
    val wrongFlag = rows.filter(col("filled"))
      .join(observedDays, rows("day_idx") === observedDays("d") &&
        rows("event_type") === observedDays("event_type"))
    assert(wrongFlag.count() === 0)
  }

  test("plan: both fill directions share one group-keyed sort, no single partition") {
    val plan = TimeSeriesOps.interpGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SinglePartition"), s"global window:\n$plan")
  }
}
