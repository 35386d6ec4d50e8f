package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** PercentileOps must be BIT-IDENTICAL to the built-in percentile_disc —
  * it replaces it inside an oracle-gated query (B11), so "close" is not
  * good enough. Checked on the real events table and on synthetic
  * boundary shapes (ties, tiny n, p at the rank boundary, forced
  * multi-iteration narrowing). */
class PercentileOpsSpec extends SparkSpec {
  import spark.implicits._

  private val ps = Seq(0.5, 0.9, 0.99)

  private def builtin(df: org.apache.spark.sql.DataFrame, group: String,
      value: String): Map[(String, Double), Double] =
    df.groupBy(col(group).cast("string").as("g"))
      .agg(
        expr(s"percentile_disc(0.5) WITHIN GROUP (ORDER BY $value)").as("p50"),
        expr(s"percentile_disc(0.9) WITHIN GROUP (ORDER BY $value)").as("p90"),
        expr(s"percentile_disc(0.99) WITHIN GROUP (ORDER BY $value)").as("p99"))
      .collect()
      .flatMap(r => ps.zipWithIndex.map { case (p, i) =>
        (r.getString(0), p) -> r.getDouble(i + 1) })
      .toMap

  test("matches the built-in exactly on the real events table") {
    val ev = Tables.events(spark, sf).select("event_type", "value")
    val got = PercentileOps.percentileDisc(ev, "event_type", "value", ps)
    val exp = builtin(ev, "event_type", "value")
    assert(got === exp)
  }

  test("matches the built-in when narrowing is forced through many passes") {
    val ev = Tables.events(spark, sf).select("event_type", "value")
    // bands=4 + directCap=8: every state needs several banding rounds
    val got = PercentileOps.percentileDisc(ev, "event_type", "value", ps,
      bands = 4, directCap = 8)
    assert(got === builtin(ev, "event_type", "value"))
  }

  test("boundary shapes: ties, single value, rank exactly at p*n") {
    val rows =
      // heavy tie group: 90 copies of 1.0 and 10 of 2.0 — p90 must sit on
      // the tie plateau (cume_dist(1.0) = 0.9 >= 0.9)
      (1 to 90).map(_ => ("tie", 1.0)) ++ (1 to 10).map(_ => ("tie", 2.0)) ++
      // all-identical group
      (1 to 7).map(_ => ("same", 3.5)) ++
      // tiny group where k lands on an exact rank boundary: n=10, p=0.5
      // -> k=5 (5/10 = 0.5); distinct ascending values
      (1 to 10).map(i => ("tiny", i.toDouble)) ++
      // negatives and an extreme outlier (banding must not lose the tail)
      (1 to 99).map(i => ("skew", -i.toDouble)) :+ (("skew", 1e15))
    val df = rows.toDF("g", "v")
    val got = PercentileOps.percentileDisc(df, "g", "v", ps, bands = 8, directCap = 4)
    assert(got === builtin(df, "g", "v"))
    assert(got(("tie", 0.9)) === 1.0)
    assert(got(("tiny", 0.5)) === 5.0)
    assert(got(("same", 0.99)) === 3.5)
  }

  test("NaN sorts last, like the built-in's ordering") {
    val df = Seq(
      ("mixed", 1.0), ("mixed", 2.0), ("mixed", Double.NaN), ("mixed", Double.NaN),
      ("allnan", Double.NaN), ("allnan", Double.NaN),
      ("clean", 1.0), ("clean", 2.0), ("clean", 3.0))
      .toDF("g", "v")
    val got = PercentileOps.percentileDisc(df, "g", "v", ps)
    val exp = builtin(df, "g", "v")
    // Scala's boxed == keeps NaN != NaN, so compare via Double.compare
    assert(got.keySet === exp.keySet)
    got.foreach { case (k, v) =>
      assert(java.lang.Double.compare(v, exp(k)) === 0, s"$k: $v vs ${exp(k)}") }
    // mixed: n=4 incl two NaN; p50 -> k=2 lands on 2.0, p90/p99 -> the NaN tail
    assert(got(("mixed", 0.5)) === 2.0)
    assert(got(("mixed", 0.9)).isNaN && got(("allnan", 0.5)).isNaN)
  }

  test("group cardinality past maxGroups fails loudly, bounded collect") {
    // one group per row: pointing the operator at a high-cardinality
    // group column must be a named error, not a silent driver OOM
    val df = (1 to 50).map(i => (s"g$i", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalArgumentException] {
      PercentileOps.percentileDisc(df, "g", "v", Seq(0.5), maxGroups = 10)
    }
    assert(e.getMessage.contains("maxGroups"))
    // at exactly the cap it still resolves
    val ok = PercentileOps.percentileDisc(df, "g", "v", Seq(0.5), maxGroups = 50)
    assert(ok.size === 50)
  }

  test("maxIter exhaustion above directCap fails loudly instead of collecting") {
    // maxIter=0 forces every state straight to the terminal path; with
    // directCap=1 and 100 distinct values the residual exceeds the cap
    val df = (1 to 100).map(i => ("a", i.toDouble)).toDF("g", "v")
    val e = intercept[IllegalStateException] {
      PercentileOps.percentileDisc(df, "g", "v", Seq(0.5),
        directCap = 1, maxIter = 0)
    }
    assert(e.getMessage.contains("directCap"))
  }

  test("null values are ignored, like the built-in") {
    val df = Seq(("a", Some(1.0)), ("a", None), ("a", Some(3.0)), ("a", Some(2.0)))
      .toDF("g", "v")
    val got = PercentileOps.percentileDisc(df, "g", "v", Seq(0.5))
    assert(got(("a", 0.5)) === 2.0)
  }
}
