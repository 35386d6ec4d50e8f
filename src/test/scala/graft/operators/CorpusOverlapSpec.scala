package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CorpusOverlapSpec extends SparkSpec {
  import spark.implicits._

  private def doc(words: Seq[String]) = words.mkString(" ")

  test("exactOverlap computes containment from constructed shingle sets") {
    // A: shingles over w0..w9 (8 shingles); B: w5..w14 (8 shingles),
    // overlap = shingles fully inside w5..w9 = 3
    val a = doc((0 to 9).map(i => s"w$i"))
    val b = doc((5 to 14).map(i => s"w$i"))
    val df = Seq(("A", a), ("B", b)).toDF("src", "text")
    val r = CorpusOverlap.exactOverlap(df, "src", "text").collect().head
    assert((r.getString(0), r.getString(1)) === (("A", "B")))
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((8L, 8L, 3L)))
    assert(r.getDouble(5) === 3.0 / 8)
    assert(r.getDouble(7) === 3.0 / 13)
  }

  test("duplicate documents don't inflate distinct shingle sets") {
    val a = doc((0 to 9).map(i => s"w$i"))
    val df = Seq(("A", a), ("A", a), ("B", a)).toDF("src", "text")
    val r = CorpusOverlap.exactOverlap(df, "src", "text").collect().head
    assert((r.getLong(2), r.getLong(3), r.getLong(4)) === ((8L, 8L, 8L)))
    assert(r.getDouble(7) === 1.0)
  }

  test("sketch estimate tracks exact containment on seeded corpora") {
    // two corpora sharing exactly half their vocabulary runs
    val mk = (tag: String, lo: Int, hi: Int) =>
      (lo until hi).map(i => (tag, doc((0 until 12).map(j => s"t${i}_$j"))))
    val df = (mk("A", 0, 300) ++ mk("B", 150, 450)).toDF("src", "text")
    val exact = CorpusOverlap.exactOverlap(df, "src", "text").collect().head
    val cExact = exact.getDouble(5)
    val sk = CorpusOverlap.overlapSketch(df, "src", "text", k = 512)
    val est = CorpusOverlap.estimateOverlap(sk, k = 512).collect().head
    val cEst = est.getDouble(5)
    assert(math.abs(cEst - cExact) < 0.1,
      s"containment est $cEst vs exact $cExact")
    // identical corpora estimate 1.0 exactly (sketches coincide)
    val same = (mk("X", 0, 50) ++ mk("Y", 0, 50)).toDF("src", "text")
    val est2 = CorpusOverlap.estimateOverlap(
      CorpusOverlap.overlapSketch(same, "src", "text", 256), 256)
      .collect().head
    assert(est2.getDouble(4) === 1.0)
    assert(est2.getDouble(5) === 1.0)
  }

  test("gate runs on real sources and stays within [0,1]") {
    val rows = CorpusOverlap.overlapGate(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(5) >= 0 && r.getDouble(5) <= 1)
      assert(r.getDouble(7) >= 0 && r.getDouble(7) <= 1)
      assert(r.getLong(4) <= math.min(r.getLong(2), r.getLong(3)))
    }
  }

  test("plan: pair expansion rides the shingle aggregation, no cartesian") {
    val plan = CorpusOverlap.overlapGate(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), s"cartesian:\n$plan")
  }
}
