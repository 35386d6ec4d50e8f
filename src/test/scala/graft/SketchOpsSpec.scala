package graft

import graft.operators.SketchOps
import org.apache.spark.sql.functions._

class SketchOpsSpec extends SparkSpec {

  private def grams = Tables.documents(spark, sf)
    .select(split(col("text"), " ").as("toks"))
    .filter(size(col("toks")) >= 3)
    .select(explode(expr(
      "transform(sequence(0, size(toks) - 3), i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))"))
      .as("gram"))

  test("hash-first heavy hitters equal the direct string-keyed top-k on the real corpus") {
    val direct = grams.groupBy(col("gram")).agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("gram")).limit(20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    val hashed = SketchOps.topKHeavyHitters(grams, "gram", 20)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(hashed.toSeq === direct.toSeq)
    assert(direct.nonEmpty)
  }

  test("heavy-hitter counts are exact, not hash-bucket counts") {
    import spark.implicits._
    // two values, heavily skewed; phase-2 recount must report true counts
    val rows = (Seq.fill(100)("alpha") ++ Seq.fill(7)("beta")).toDF("v")
    val got = SketchOps.topKHeavyHitters(rows, "v", 2)
      .collect().map(r => (r.getString(0), r.getLong(1)))
    assert(got.toSeq === Seq(("alpha", 100L), ("beta", 7L)))
  }

  test("HLL distinct lands within the advertised error of the exact vocabulary size") {
    val toks = Tables.documents(spark, sf)
      .select(explode(split(col("text"), " ")).as("tok"))
    val exact = toks.agg(countDistinct(col("tok"))).collect()(0).getLong(0)
    val approx = SketchOps.approxDistinct(toks, "tok", rsd = 0.02)
      .collect()(0).getLong(0)
    val relErr = math.abs(approx - exact).toDouble / exact
    assert(relErr <= 0.06, s"exact=$exact approx=$approx relErr=$relErr")
    // and the plan carries no per-value shuffle: a single partial/final agg
    val p = SketchOps.approxDistinct(toks, "tok").queryExecution.executedPlan.toString
    assert(!p.contains("Expand"), s"unexpected expand in HLL plan:\n$p")
  }
}
