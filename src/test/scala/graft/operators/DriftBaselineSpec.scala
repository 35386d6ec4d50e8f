package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Durable drift baselines: exact edge/histogram round-trip (incl. the
  * NULL bin and NULL category), frozen-edge scoring parity with the
  * in-session comparator, and the commit guards. */
class DriftBaselineSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-dbase").toString

  private val edges = Seq(0.0, 10.5, 20.25, 30.0)

  private def refDf = Seq[Option[Double]](
    Some(1.0), Some(5.0), Some(12.0), Some(15.0), Some(22.0),
    Some(35.0), None, None).toDF("value")

  test("numeric baseline round-trips exactly: edges (Double.toString " +
    "round-trip), counts, and the NULL bin") {
    val dir = tmp()
    val hist = DriftMonitor.histogram(refDf, "value", edges)
    DriftBaseline.saveNumeric(spark, dir, edges, hist)
    val (e2, h2) = DriftBaseline.loadNumeric(spark, dir)
    assert(e2 == edges)
    assert(h2.orderBy("bin").as[(Int, Long)].collect().toSeq ==
      hist.orderBy("bin").as[(Int, Long)].collect().toSeq)
    assert(h2.filter($"bin" === -1).as[(Int, Long)].head()._2 == 2L)
  }

  test("scoring a live population against the frozen baseline equals " +
    "the in-session comparator, and identical populations score zero") {
    val dir = tmp()
    DriftBaseline.saveNumeric(spark, dir, edges,
      DriftMonitor.histogram(refDf, "value", edges))
    val self = DriftBaseline.scoreNumeric(spark, dir, refDf, "value")
      .collect().head
    assert(self.getAs[Double]("psi") == 0.0)
    val cur = Seq(25.0, 26.0, 27.0, 40.0).toDF("value")
    val viaArtifact = DriftBaseline.scoreNumeric(spark, dir, cur, "value")
      .collect().head
    val inSession = DriftMonitor.driftSummary(
      DriftMonitor.numericDrift(refDf, cur, "value", edges))
      .collect().head
    assert(viaArtifact.getAs[Double]("psi") ==
      inSession.getAs[Double]("psi"))
    assert(viaArtifact.getAs[Long]("n_ref") ==
      inSession.getAs[Long]("n_ref"))
  }

  test("a histogram binned under different edges cannot commit") {
    val dir = tmp()
    val hist = DriftMonitor.histogram(refDf, "value",
      Seq(0.0, 1.0, 2.0, 3.0, 4.0, 5.0, 6.0)) // 7 edges -> bins up to 7
    intercept[IllegalArgumentException] {
      DriftBaseline.saveNumeric(spark, dir, Seq(0.0, 10.0), hist)
    }
  }

  test("categorical baseline round-trips with the NULL category; " +
    "cross-kind loads refuse") {
    val dir = tmp()
    val cats = Seq(Some("en"), Some("en"), Some("de"), None)
      .toDF("lang")
    val hist = DriftMonitor.categoricalHistogram(cats, "lang")
    DriftBaseline.saveCategorical(spark, dir, hist)
    val back = DriftBaseline.loadCategorical(spark, dir)
    assert(back.orderBy("category").as[(Option[String], Long)]
      .collect().toSeq ==
      hist.orderBy("category").as[(Option[String], Long)]
        .collect().toSeq)
    intercept[IllegalArgumentException] {
      DriftBaseline.loadNumeric(spark, dir)
    }
  }
}
