package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** B30 correlation matrix: hand-computed exact values, the pinned
  * zero-variance NULL, the 2^53 refusal, fast-path drift bound, and
  * the one-aggregate plan shape. */
class CorrelationOpsSpec extends SparkSpec {
  import spark.implicits._

  // x = 1..4; y = 2x (corr exactly 1); z anti-monotone; w constant
  private def fixture = Seq(
    (1L, 2L, 4L, 7L), (2L, 4L, 3L, 7L), (3L, 6L, 2L, 7L), (4L, 8L, 1L, 7L)
  ).toDF("x", "y", "z", "w")

  test("exact values: the pinned IEEE formula bit-for-bit (perfect " +
    "correlation reads 1-ulp-shy of 1 when sqrt*sqrt rounds — the " +
    "oracle computes the identical bits), constant column -> NULL") {
    val out = CorrelationOps.corrMatrix(fixture, Seq("x", "y", "z", "w"))
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        Option(r.getAs[java.lang.Double]("corr")).map(_.doubleValue))
      .toMap
    assert(out.size === 6)
    // replicate the EXACT operation sequence on exact integers
    def pinned(xs: Seq[Long], ys: Seq[Long]): Double = {
      val n = xs.size.toLong
      val num = n * xs.zip(ys).map(p => p._1 * p._2).sum - xs.sum * ys.sum
      val d1 = n * xs.map(v => v * v).sum - xs.sum * xs.sum
      val d2 = n * ys.map(v => v * v).sum - ys.sum * ys.sum
      num.toDouble / (math.sqrt(d1.toDouble) * math.sqrt(d2.toDouble))
    }
    val xs = Seq(1L, 2L, 3L, 4L)
    assert(out(("x", "y")) === Some(pinned(xs, xs.map(_ * 2))))
    assert(out(("x", "y")).get > 0.999999999999999)
    assert(out(("x", "z")) === Some(pinned(xs, Seq(4L, 3L, 2L, 1L))))
    assert(out(("x", "z")).get < -0.999999999999999)
    assert(out(("x", "w")) === None) // zero variance: pinned NULL
    // n and sxy ride along exactly
    val row = CorrelationOps.corrMatrix(fixture, Seq("x", "y"))
      .collect().head
    assert(row.getAs[Long]("n") === 4L)
    assert(row.getAs[Long]("sxy") === (2L + 8 + 18 + 32))
  }

  test("guards: duplicate / too-few columns refuse; operands at 2^53 " +
    "refuse loudly instead of rounding") {
    intercept[IllegalArgumentException] {
      CorrelationOps.corrMatrix(fixture, Seq("x")) }
    intercept[IllegalArgumentException] {
      CorrelationOps.corrMatrix(fixture, Seq("x", "x")) }
    // two rows of +/- 2^27.5-ish magnitude push n*Sxx past 2^53
    val big = Seq(200000000L, -170000000L, 180000000L, -150000000L)
      .zipWithIndex.map { case (v, i) => (v, i.toLong) }
      .toDF("v", "i")
    val err = intercept[Exception] {
      CorrelationOps.corrMatrix(big, Seq("v", "i")).collect() }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(e => e.getMessage +: msgs(e.getCause))
    assert(msgs(err).exists(m => m != null && m.contains("2^53")))
  }

  test("fast path agrees with the exact path to 1e-12 on the real " +
    "lineitem units") {
    val units = graft.Tables.load(spark, sf, "lineitem").select(
      floor(col("l_quantity") + 0.5).cast("long").as("qty"),
      floor(col("l_discount") * 100 + 0.5).cast("long").as("disc_pct"),
      floor(col("l_tax") * 100 + 0.5).cast("long").as("tax_pct"))
    val cols = Seq("qty", "disc_pct", "tax_pct")
    def asMap(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        r.getAs[java.lang.Double]("corr")).toMap
    val exact = asMap(CorrelationOps.corrMatrix(units, cols))
    val fast = asMap(CorrelationOps.corrMatrixFast(units, cols))
    assert(exact.keySet === fast.keySet)
    exact.foreach { case (k, e) =>
      assert(math.abs(e - fast(k)) < 1e-12, s"$k: $e vs ${fast(k)}") }
  }

  test("plan: ONE aggregate over the corpus — no union re-scan, no " +
    "join, no window") {
    val plan = CorrelationOps.corrMatrix(fixture, Seq("x", "y", "z"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Union"))
    assert(!plan.contains("Join"))
    assert(!plan.contains("Window"))
  }
}
