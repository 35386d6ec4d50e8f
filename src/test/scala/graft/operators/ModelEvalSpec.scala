package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class ModelEvalSpec extends SparkSpec {
  import spark.implicits._

  private def aucOf(rows: (Double, Boolean)*) = {
    val r = ModelEval.auc(rows.toSeq.toDF("s", "y"), "s", "y", 4)
      .collect().head
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)))
  }

  test("perfect, inverted, and random-tie scorers hit 1.0, 0.0, 0.5") {
    assert(aucOf((0.9, true), (0.8, true), (0.2, false), (0.1, false))
      === ((2L, 2L, 0L, Some(1.0))))
    assert(aucOf((0.1, true), (0.2, true), (0.8, false), (0.9, false))
      === ((2L, 2L, 0L, Some(0.0))))
    // all tied: every pair is half-won
    assert(aucOf((0.5, true), (0.5, false), (0.5, true), (0.5, false))._4
      === Some(0.5))
  }

  test("AUC matches the hand-computed pair count under mixed ties") {
    // scores: pos {3, 2, 2}, neg {2, 1}: pairs = 6
    // pos3: beats both (2). pos2 x neg2: tie (0.5 each, 2 pos2s -> 1.0);
    // pos2 x neg1: wins (2). total = 2 + 1 + 2 = 5 -> auc = 5/6
    val got = aucOf((3.0, true), (2.0, true), (2.0, true),
      (2.0, false), (1.0, false))
    assert(math.abs(got._4.get - 5.0 / 6.0) < 1e-15)
  }

  test("null score or label rows are excluded and counted, not guessed") {
    val df = Seq((Some(0.9), Some(true)), (Some(0.1), Some(false)),
      (Option.empty[Double], Some(true)), (Some(0.5), Option.empty[Boolean]))
      .toDF("s", "y")
    val r = ModelEval.auc(df, "s", "y", 4).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2)) === ((1L, 1L, 2L)))
    assert(r.getDouble(3) === 1.0)
  }

  test("single-class input pins AUC NULL") {
    assert(aucOf((0.9, true), (0.8, true))._4 === None)
  }

  test("confusion matrix and derived metrics by hand") {
    val df = Seq((0.9, true), (0.8, false), (0.3, true), (0.2, false),
      (0.1, false)).toDF("s", "y")
    val r = ModelEval.confusion(df, "s", "y", threshold = 0.5).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      === ((1L, 1L, 2L, 1L)))
    assert(r.getDouble(4) === 0.5) // precision
    assert(r.getDouble(5) === 0.5) // recall
    assert(r.getDouble(6) === 0.5) // f1
    assert(r.getDouble(7) === 0.6) // accuracy
    // degenerate: nothing predicted positive -> precision NULL
    val none = ModelEval.confusion(df, "s", "y", threshold = 2.0)
      .collect().head
    assert(none.isNullAt(4) && none.getDouble(5) === 0.0)
  }

  test("calibration bins: assignment, edge clamping, exact rates") {
    val df = Seq((0.05, false), (0.05, true), (0.55, true), (0.55, true),
      (-3.0, false), (9.9, true)).toDF("s", "y")
    val got = ModelEval.calibration(df, "s", "y", bins = 10, lo = 0.0, hi = 1.0)
      .collect().map(r => r.getLong(0) ->
        (r.getDouble(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got(0L) === ((0.0, 3L, 1L, 1.0 / 3))) // -3.0 clamps into bin 0
    assert(got(5L) === ((0.5, 2L, 2L, 1.0)))
    assert(got(9L) === ((0.9, 1L, 1L, 1.0)))     // 9.9 clamps into bin 9
    assert(got.keySet === Set(0L, 5L, 9L))
    intercept[IllegalArgumentException] {
      ModelEval.calibration(df, "s", "y", bins = 1, lo = 0.0, hi = 1.0)
    }
  }

  test("calibration excludes NaN scores instead of clamping them into the top bin") {
    val df = Seq((0.95, true), (Double.NaN, false), (Double.NaN, false))
      .toDF("s", "y")
    val got = ModelEval.calibration(df, "s", "y", bins = 10, lo = 0.0, hi = 1.0)
      .collect().map(r => r.getLong(0) -> (r.getLong(2), r.getDouble(4))).toMap
    // without the isnan filter the two NaNs would land in bin 9 and
    // report pos_rate 1/3; they must simply not participate
    assert(got === Map(9L -> ((1L, 1.0))))
  }

  test("gates run on real data; AUC sits in (0,1) with full coverage") {
    val r = ModelEval.aucGate(spark, sf).collect().head
    val total = graft.Tables.lineitem(spark, sf).count()
    assert(r.getLong(0) + r.getLong(1) === total)
    assert(r.getLong(2) === 0L)
    assert(r.getDouble(3) > 0.0 && r.getDouble(3) < 1.0)
    val c = ModelEval.confusionGate(spark, sf).collect().head
    assert(c.getLong(0) + c.getLong(1) + c.getLong(2) + c.getLong(3) === total)
  }

  test("plan: the prefix window is partitioned, never a global window") {
    val plan = ModelEval.aucGate(spark, sf)
      .queryExecution.executedPlan.toString
    // the only SinglePartition exchanges allowed are the final 1-row
    // scalar aggregations (map-side partials ride them); the Window
    // itself must partition by the range-partition id
    assert(plan.contains("windowspecdefinition(_ppid"),
      s"prefix window lost its partitioning:\n$plan")
    val windowOnSingle = plan.linesIterator.zipWithIndex.exists {
      case (l, _) => l.contains("Window [") && !l.contains("_ppid")
    }
    assert(!windowOnSingle, s"unpartitioned window:\n$plan")
  }
}
