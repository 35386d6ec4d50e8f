package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TargetEncodeSpec extends SparkSpec {
  import spark.implicits._

  private val df = Seq(
    (1L, "a", 10L), (2L, "a", 20L), (3L, "a", 30L),
    (4L, "b", 100L), (5L, "b", 200L),
    (6L, "c", 7L)) // singleton category
    .toDF("id", "cat", "y")

  test("leave-one-out excludes the row's own target; singleton pins NULL") {
    val got = TargetEncode.encode(df, "id", "cat", "y", m = 2.0)
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(3)) None else Some(r.getDouble(3)))).toMap
    assert(got(1L) === Some(25.0)) // (20+30)/2
    assert(got(2L) === Some(20.0)) // (10+30)/2
    assert(got(4L) === Some(200.0))
    assert(got(6L) === None)
  }

  test("m-estimate shrinks toward the global prior by pseudo-count") {
    val prior = (10 + 20 + 30 + 100 + 200 + 7) / 6.0
    val got = TargetEncode.mEstimate(df, "cat", "y", m = 2.0)
      .collect().map(r => r.getString(0) -> r.getDouble(2)).toMap
    assert(math.abs(got("a") - (60.0 + 2.0 * prior) / 5.0) < 1e-12)
    assert(math.abs(got("c") - (7.0 + 2.0 * prior) / 3.0) < 1e-12)
    // singleton sits far closer to the prior than its raw mean
    assert(math.abs(got("c") - prior) < math.abs(7.0 - prior) / 2)
  }

  test("WOE matches the smoothed log-odds by hand; symmetric label flips sign") {
    val d = Seq(("m1", true), ("m1", true), ("m1", false),
      ("m2", false), ("m2", false), ("m2", true)).toDF("cat", "lab")
    val got = TargetEncode.woe(d, "cat", "lab", lambda = 0.5)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(_._1)
    val g = 3.0; val b = 3.0; val k = 2.0
    val w1 = math.log(((2 + 0.5) / (g + 0.5 * k)) / ((1 + 0.5) / (b + 0.5 * k)))
    assert(got(0) === (("m1", 2L, 1L, w1)))
    // the mirrored category gets the mirrored score
    assert(math.abs(got(0)._4 + got(1)._4) < 1e-15)
  }

  test("information value is positive for a separating feature, ~0 for noise") {
    val sep = Seq.tabulate(100)(i =>
      (if (i % 2 == 0) "g" else "h", i % 2 == 0)).toDF("cat", "lab")
    val ivSep = TargetEncode.informationValue(
      TargetEncode.woe(sep, "cat", "lab"))
    val noise = Seq.tabulate(100)(i => ("only", i % 2 == 0)).toDF("cat", "lab")
    val ivNoise = TargetEncode.informationValue(
      TargetEncode.woe(noise, "cat", "lab"))
    assert(ivSep > 1.0)
    assert(math.abs(ivNoise) < 1e-9)
  }

  test("gates run on real tables with full coverage") {
    val enc = TargetEncode.encodeGate(spark, sf)
    assert(enc.count() === graft.Tables.orders(spark, sf).count())
    assert(enc.filter(col("enc_loo").isNull).count() === 0) // no singleton prios
    val w = TargetEncode.woeGate(spark, sf)
    assert(w.count() === graft.Tables.orders(spark, sf)
      .select("o_orderpriority").distinct().count())
  }

  test("plan: encodings join back broadcast; the corpus is never row-shuffled") {
    val plan = TargetEncode.encodeGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"not broadcast:\n$plan")
  }
}
