package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RegressionOpsSpec extends SparkSpec {
  import spark.implicits._

  test("olsTrend recovers an exact linear relationship") {
    // y = 2x + 3 over integers: num/dx divide exactly
    val df = Seq((0, 3), (1, 5), (2, 7), (3, 9)).map { case (x, y) =>
      ("g", x.toLong, y.toLong)
    }.toDF("grp", "x", "y")
    val r = olsRow(df)
    assert(r._2 === 4L)
    assert(r._3 === Some(2.0))
    assert(r._4 === Some(3.0))
    assert(math.abs(r._5.get - 1.0) < 1e-12)
  }

  private def olsRow(df: org.apache.spark.sql.DataFrame) = {
    val r = RegressionOps.olsTrend(df, "grp", "x", "y").collect().head
    (r.getString(0), r.getLong(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)),
      if (r.isNullAt(3)) None else Some(r.getDouble(3)),
      if (r.isNullAt(4)) None else Some(r.getDouble(4)))
  }

  test("olsTrend pins degenerate variance cases to NULL") {
    // zero x-variance: slope/intercept/r2 all null
    val constX = Seq(("g", 5L, 1L), ("g", 5L, 2L)).toDF("grp", "x", "y")
    assert(olsRow(constX) === (("g", 2L, None, None, None)))
    // zero y-variance: exact zero slope, intercept = mean y, r2 null
    val constY = Seq(("g", 1L, 7L), ("g", 3L, 7L)).toDF("grp", "x", "y")
    assert(olsRow(constY) === (("g", 2L, Some(0.0), Some(7.0), None)))
  }

  test("olsTrendFast agrees with the exact form to ulps at test SF") {
    val li = graft.Tables.lineitem(spark, sf).select(
      col("l_returnflag").as("grp"),
      floor(col("l_quantity") + 0.5).cast("long").as("x"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("y"))
    val exact = RegressionOps.olsTrend(li, "grp", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    val fast = RegressionOps.olsTrendFast(li, "grp", "x", "y")
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(exact.keySet === fast.keySet)
    for ((g, s) <- exact)
      assert(math.abs(s - fast(g)) <= 1e-9 * math.max(1.0, math.abs(s)),
        s"group $g: exact $s vs fast ${fast(g)}")
  }

  test("olsTrend refuses loudly past the 2^53 guard") {
    // dx = n·Σxx − Σx² is spread-scaled: two points 2³¹ apart give
    // dx = (x1−x2)² = 2⁶² > 2⁵³
    val big = Seq(("g", 0L, 0L), ("g", 1L << 31, 1L << 31))
      .toDF("grp", "x", "y")
    val e = intercept[Exception] {
      RegressionOps.olsTrend(big, "grp", "x", "y").collect()
    }
    assert(e.getMessage.contains("2^53"))
  }

  test("welchTTest matches a hand-computed reference") {
    // a: (1,2,3,4)  n=4 m=2.5 v=5/3;  b: (2,4,6,8,10) n=5 m=6 v=10
    val df = (Seq.tabulate(4)(i => ("a", (i + 1).toLong)) ++
      Seq.tabulate(5)(i => ("b", 2L * (i + 1)))).toDF("grp", "v")
    val r = RegressionOps.welchTTest(df, "grp", "v").collect().head
    val (va, vb) = (5.0 / 3.0, 10.0)
    val se2 = va / 4 + vb / 5
    val tExp = (2.5 - 6.0) / math.sqrt(se2)
    val dfExp = se2 * se2 /
      ((va / 4) * (va / 4) / 3 + (vb / 5) * (vb / 5) / 4)
    assert((r.getString(0), r.getString(1)) === (("a", "b")))
    assert((r.getLong(2), r.getLong(3)) === ((4L, 5L)))
    assert(math.abs(r.getDouble(6) - tExp) < 1e-12)
    assert(math.abs(r.getDouble(7) - dfExp) < 1e-12)
  }

  test("welchTTest: identical samples give t = 0; n<2 groups drop; zero-variance pair pins NULL") {
    val df = (Seq.tabulate(6)(i => ("a", (i % 3).toLong)) ++
      Seq.tabulate(6)(i => ("b", (i % 3).toLong)) ++
      Seq(("tiny", 1L), ("c0", 4L), ("c0", 4L), ("d0", 4L), ("d0", 4L)))
      .toDF("grp", "v")
    val rows = RegressionOps.welchTTest(df, "grp", "v")
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (if (r.isNullAt(6)) None else Some(r.getDouble(6)))).toMap
    assert(!rows.keys.exists(p => p._1 == "tiny" || p._2 == "tiny"))
    assert(rows(("a", "b")) === Some(0.0))
    assert(rows(("c0", "d0")) === None) // both zero variance -> se2 = 0
  }

  test("gates run on real tables; every pair present") {
    val welch = RegressionOps.welchGate(spark, sf)
    val nTypes = graft.Tables.events(spark, sf)
      .select("event_type").distinct().count()
    assert(welch.count() === nTypes * (nTypes - 1) / 2)
    val ols = RegressionOps.olsTrendGate(spark, sf)
    assert(ols.count() === graft.Tables.lineitem(spark, sf)
      .select("l_returnflag").distinct().count())
    assert(ols.filter(col("slope").isNull).count() === 0)
  }

  test("plan: one corpus aggregation, groups-sized frame joined broadcast") {
    val plan = RegressionOps.welchGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastNestedLoopJoin") ||
      plan.contains("BroadcastHashJoin"), s"pairing not broadcast:\n$plan")
    // corpus touched exactly once: the stats frame is checkpointed, so
    // the join plan reads scanned RDD blocks, never the parquet corpus
    val scans = "Scan parquet".r.findAllIn(plan).length
    assert(scans === 0, s"corpus re-scanned by the pairing join:\n$plan")
  }
}
