package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class FunnelOpsSpec extends SparkSpec {
  import spark.implicits._

  private def t(m: Int) = new Timestamp(m * 60000L)

  private def trace(rows: (Long, String, Int)*) =
    FunnelOps.funnel(
      rows.toSeq.map { case (u, ty, m) => (u, ty, t(m)) }.toDF("u", "ty", "ts"),
      "u", "ty", "ts", Seq("a", "b", "c"))
      .collect().map(r => r.getLong(0) ->
        ((1 to 3).map(i => Option(r.getTimestamp(i)).map(_.getTime / 60000L)),
          r.getLong(4))).toMap

  test("greedy-earliest matching with strict step ordering") {
    val got = trace(
      // user 1 completes: a@1, b@5 (b@0 is before a and must not count), c@9
      (1L, "b", 0), (1L, "a", 1), (1L, "b", 5), (1L, "c", 9),
      // user 2 stalls at b: c fires BEFORE b, never after
      (2L, "a", 1), (2L, "c", 2), (2L, "b", 3),
      // user 3 never starts (no 'a') — absent
      (3L, "b", 1), (3L, "c", 2))
    assert(got(1L) === ((Seq(Some(1L), Some(5L), Some(9L)), 3L)))
    assert(got(2L) === ((Seq(Some(1L), Some(3L), None), 2L)))
    assert(!got.contains(3L))
  }

  test("same-instant next step does not chain (strict >)") {
    val got = trace((1L, "a", 5), (1L, "b", 5), (1L, "c", 6))
    assert(got(1L)._2 === 1L)
  }

  test("greedy completeness: early b that breaks c still completes via later b") {
    // a@1, b@2, c@1 (useless), b@4, c@5: greedy takes b@2 then c@5
    val got = trace((1L, "a", 1), (1L, "c", 1), (1L, "b", 2),
      (1L, "b", 4), (1L, "c", 5))
    assert(got(1L) === ((Seq(Some(1L), Some(2L), Some(5L)), 3L)))
  }

  test("repeated step types refuse loudly") {
    val e = intercept[IllegalArgumentException] {
      FunnelOps.funnel(Seq((1L, "a", t(1))).toDF("u", "ty", "ts"),
        "u", "ty", "ts", Seq("a", "b", "a"))
    }
    assert(e.getMessage.contains("repeated"))
  }

  test("summary rolls the trace into per-stage conversion") {
    val df = Seq(
      (1L, "a", t(1)), (1L, "b", t(2)), (1L, "c", t(3)),
      (2L, "a", t(1)), (2L, "b", t(2)),
      (3L, "a", t(1)), (4L, "a", t(1))).toDF("u", "ty", "ts")
    val tr = FunnelOps.funnel(df, "u", "ty", "ts", Seq("a", "b", "c"))
    val sm = FunnelOps.funnelSummary(tr, 3)
      .collect().map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(sm(1) === ((4L, 1.0)))
    assert(sm(2) === ((2L, 0.5)))
    assert(sm(3) === ((1L, 0.5)))
  }

  test("summary pins NULL (not NaN) conversion after a stage nobody reached") {
    val df = Seq((1L, "a", t(1)), (2L, "a", t(2))).toDF("u", "ty", "ts")
    val tr = FunnelOps.funnel(df, "u", "ty", "ts", Seq("a", "b", "c"))
    val sm = FunnelOps.funnelSummary(tr, 3).orderBy(col("step")).collect()
    assert(sm(1).getLong(1) === 0L)          // n_2 = 0
    assert(sm(2).getLong(1) === 0L)          // n_3 = 0
    assert(!sm(1).isNullAt(2) && sm(1).getDouble(2) === 0.0) // 0/2
    assert(sm(2).isNullAt(2), "0/0 must pin NULL, not NaN")
  }

  test("gate runs on real events; steps_completed is a monotone prefix count") {
    val g = FunnelOps.funnelGate(spark, sf).cache()
    assert(g.count() > 0)
    // t_3 set implies t_2 set implies t_1 set, and timestamps ascend
    assert(g.filter(col("t_3").isNotNull && col("t_2").isNull).count() === 0)
    assert(g.filter(col("t_2").isNotNull && col("t_2") <= col("t_1")).count() === 0)
    assert(g.filter(col("t_3").isNotNull && col("t_3") <= col("t_2")).count() === 0)
    g.unpersist()
  }

  test("plan: step filters push into the scan; no window, no cartesian") {
    val plan = FunnelOps.funnelGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"))
    assert(!plan.contains("Window"), s"unexpected window:\n$plan")
  }
}
