package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame

class MixtureOptimizerSpec extends SparkSpec {
  import spark.implicits._

  private def wdf(rows: (String, Double)*): DataFrame =
    rows.toSeq.toDF("source", "weight")
  private def edf(rows: (String, Double)*): DataFrame =
    rows.toSeq.toDF("source", "excess_loss")
  private def asMap(df: DataFrame): Map[String, Double] =
    df.collect().map(r => r.getString(0) -> r.getDouble(1)).toMap

  test("one step matches the hand-computed multiplicative update") {
    val prior = wdf("a" -> 0.5, "b" -> 0.3, "c" -> 0.2)
    val excess = edf("a" -> 0.0, "b" -> 1.0, "c" -> -2.0)
    val eta = 0.5; val c = 0.01
    val got = asMap(MixtureOptimizer.doremiStep(prior, excess, eta, c))
    // by hand: up_a = 0.5*e^0, up_b = 0.3*e^0.5, up_c = 0.2*e^0 (clamped)
    val up = Map("a" -> 0.5, "b" -> 0.3 * math.exp(0.5), "c" -> 0.2)
    val tot = up.values.sum
    up.foreach { case (s, w) =>
      val want = 0.99 * w / tot + 0.01 / 3
      assert(math.abs(got(s) - want) < 1e-15, s"$s: ${got(s)} vs $want")
    }
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("zero excess everywhere leaves normalized weights in place (c=0)") {
    val prior = wdf("a" -> 2.0, "b" -> 1.0, "c" -> 1.0)
    val got = asMap(MixtureOptimizer.doremiStep(prior,
      edf("a" -> 0.0, "b" -> 0.0, "c" -> 0.0), eta = 1.0, smoothing = 0.0))
    assert(math.abs(got("a") - 0.5) < 1e-15)
    assert(math.abs(got("b") - 0.25) < 1e-15)
  }

  test("negative excess clamps: only renormalization moves the domain") {
    val got = asMap(MixtureOptimizer.doremiStep(
      wdf("a" -> 0.5, "b" -> 0.5),
      edf("a" -> -100.0, "b" -> 1.0), eta = 1.0, smoothing = 0.0))
    // a's raw weight unchanged at 0.5; b's multiplied by e — a shrinks
    // only because b grew
    val want = 0.5 / (0.5 + 0.5 * math.E)
    assert(math.abs(got("a") - want) < 1e-15)
  }

  test("smoothing keeps a crushed domain alive at >= c/k") {
    val got = asMap(MixtureOptimizer.doremiStep(
      wdf("a" -> 1e-12, "b" -> 1.0),
      edf("a" -> 0.0, "b" -> 10.0), eta = 1.0, smoothing = 0.1))
    assert(got("a") >= 0.1 / 2 - 1e-15,
      s"smoothing floor violated: ${got("a")}")
  }

  test("fail-closed: domain mismatch, duplicates, NaN, dead prior") {
    val prior = wdf("a" -> 0.5, "b" -> 0.5)
    intercept[IllegalArgumentException] {
      MixtureOptimizer.doremiStep(prior, edf("a" -> 0.1), 1.0) }
    intercept[IllegalArgumentException] {
      MixtureOptimizer.doremiStep(prior,
        edf("a" -> 0.1, "a" -> 0.2, "b" -> 0.1), 1.0) }
    intercept[IllegalArgumentException] {
      MixtureOptimizer.doremiStep(prior,
        edf("a" -> Double.NaN, "b" -> 0.1), 1.0) }
    intercept[IllegalArgumentException] {
      MixtureOptimizer.doremiStep(wdf("a" -> 0.0, "b" -> 1.0),
        edf("a" -> 0.1, "b" -> 0.1), 1.0) }
    intercept[IllegalArgumentException] {
      MixtureOptimizer.doremiStep(prior,
        edf("a" -> 0.1, "b" -> 0.2), eta = -1.0) }
  }

  test("run averages the per-round weights (uniform prior by default)") {
    val r1 = edf("a" -> 1.0, "b" -> 0.0)
    val r2 = edf("a" -> 0.0, "b" -> 1.0)
    val eta = 1.0; val c = 0.0
    val got = asMap(MixtureOptimizer.doremiRun(spark, Seq(r1, r2),
      eta = eta, smoothing = c))
    // round 1 from uniform: a -> e/(e+1); round 2 from that:
    // a' = (e/(e+1)) / (e/(e+1) + (1/(e+1))*e) = 1/2
    val a1 = math.E / (math.E + 1)
    val a2 = a1 / (a1 + (1 - a1) * math.E)
    val want = (a1 + a2) / 2
    assert(math.abs(got("a") - want) < 1e-15, s"${got("a")} vs $want")
    assert(math.abs(got.values.sum - 1.0) < 1e-12)
  }

  test("output composes with planMixture end-to-end") {
    val stats = Seq(("a", 1000000L), ("b", 1000000L))
      .toDF("source", "n_tokens")
    val weights = MixtureOptimizer.doremiRun(spark,
      Seq(edf("a" -> 1.0, "b" -> 0.0)), eta = 1.0, smoothing = 0.0)
    val plan = CurationOps.planMixture(stats, weights, targetTokens = 500000L)
    val rates = plan.collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    // a got e/(e+1) ~ 0.731 of 500k tokens from 1M available -> 365‰
    assert(rates("a") > rates("b"))
    assert(math.abs(rates("a") - 365L) <= 1L)
  }
}
