package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

case class EmbEv(ts: Timestamp, embedding: Seq[Float])

/** r11 directive 5: embedding drift = G22's discretize-and-PSI with a
  * frozen clustering as the discretizer, plus per-list centroid shift;
  * planted shifts fire, the unshifted twin doesn't; streaming twin via
  * the G23 window convention. */
class EmbeddingDriftSpec extends SparkSpec {
  import spark.implicits._

  // hand 2-D geometry: two well-separated lists
  private lazy val cents = Seq(
    (0, Seq(1.0f, 0.0f)), (1, Seq(0.0f, 1.0f))).toDF("list_id", "centroid")

  private def vecs2d(rows: (Long, Float, Float)*): DataFrame =
    rows.toSeq.map { case (i, x, y) => (i, Seq(x, y)) }
      .toDF("id", "embedding")

  test("profile: per-list mass and mean vector; empty lists absent") {
    val p = EmbeddingDrift.profile(
      vecs2d((1L, 0.9f, 0.1f), (2L, 1.1f, -0.1f), (3L, 0.8f, 0.0f)),
      cents).collect()
    assert(p.length == 1) // everything lands in list 0
    val r = p.head
    assert(r.getAs[Int]("cluster_id") == 0 && r.getAs[Long]("n") == 3L)
    val m = r.getSeq[Float](r.fieldIndex("mean_emb"))
    assert(math.abs(m(0) - (0.9f + 1.1f + 0.8f) / 3) < 1e-6)
  }

  test("drift: full-outer mass alignment, shift only where both sides " +
    "have members") {
    val ref = EmbeddingDrift.profile(
      vecs2d((1L, 1f, 0f), (2L, 0.9f, 0.1f), (3L, 0f, 1f)), cents)
    // list 1 emptied; list 0 members rotated toward the diagonal
    val cur = EmbeddingDrift.profile(
      vecs2d((4L, 0.7f, 0.7f), (5L, 0.8f, 0.6f)), cents)
    val d = EmbeddingDrift.drift(ref, cur).collect()
      .map(r => r.getAs[Int]("cluster_id") ->
        (r.getAs[Long]("ref_n"), r.getAs[Long]("cur_n"),
          Option(r.getAs[java.lang.Double]("centroid_shift")))).toMap
    assert(d(0)._1 == 2L && d(0)._2 == 2L)
    assert(d(1)._1 == 1L && d(1)._2 == 0L)
    assert(d(1)._3.isEmpty, "no shift without members on both sides")
    assert(d(0)._3.get > 0.05, s"rotated list must show shift: ${d(0)._3}")
  }

  test("identical populations score zero mass drift and zero shift") {
    val v = vecs2d((1L, 1f, 0f), (2L, 0f, 1f), (3L, 0.9f, 0.2f))
    val s = EmbeddingDrift.score(v, v, cents).collect().head
    assert(s.getAs[Double]("psi") == 0.0)
    assert(math.abs(s.getAs[Double]("max_shift")) < 1e-7)
    assert(math.abs(s.getAs[Double]("wmean_shift")) < 1e-7)
  }

  // ---- real corpus: planted shift fires, unshifted twin doesn't ----------

  private lazy val emb = Tables.embeddings(spark, sf)
    .select(col("vec_id").as("id"), col("embedding")).cache()
  private lazy val realCents = IvfSearch.train(emb, nlist = 8)

  test("planted distribution shift fires the score; the unshifted twin " +
    "stays quiet") {
    val refP = EmbeddingDrift.profile(emb, realCents)
    // unshifted twin: an independent half of the same corpus
    val twin = emb.filter(col("id") % 2 === 0)
    val quiet = EmbeddingDrift.driftScores(EmbeddingDrift.drift(refP,
      EmbeddingDrift.profile(twin, realCents))).collect().head
    // planted shift: a constant bias pushed onto every vector moves
    // both the list masses and the within-list means
    val shifted = emb.withColumn("embedding",
      expr("transform(embedding, x -> x + 0.5f)"))
    val loud = EmbeddingDrift.driftScores(EmbeddingDrift.drift(refP,
      EmbeddingDrift.profile(shifted, realCents))).collect().head
    val (qPsi, lPsi) = (quiet.getAs[Double]("psi"), loud.getAs[Double]("psi"))
    val (qSh, lSh) = (quiet.getAs[Double]("wmean_shift"),
      loud.getAs[Double]("wmean_shift"))
    assert(qPsi < 0.1, s"unshifted twin PSI $qPsi must read stable")
    assert(lPsi > 0.25, s"planted shift PSI $lPsi must read action-level")
    assert(lPsi > 5 * qPsi, s"$lPsi vs $qPsi")
    assert(lSh > 5 * math.max(qSh, 1e-6), s"shift $lSh vs twin $qSh")
  }

  test("frozen reference round-trips through the ModelStore (fresh-" +
    "session parity of scores)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-embdrift").toString
    val refP = EmbeddingDrift.profile(emb, realCents)
    EmbeddingDrift.saveReference(spark, dir, realCents, refP)
    val (c2, p2) = EmbeddingDrift.loadReference(spark, dir)
    val cur = emb.filter(col("id") % 3 === 0)
    val a = EmbeddingDrift.driftScores(EmbeddingDrift.drift(refP,
      EmbeddingDrift.profile(cur, realCents))).collect().head
    val b = EmbeddingDrift.driftScores(EmbeddingDrift.drift(p2,
      EmbeddingDrift.profile(cur, c2))).collect().head
    assert(a.getAs[Double]("psi") == b.getAs[Double]("psi"))
    assert(a.getAs[Double]("wmean_shift") == b.getAs[Double]("wmean_shift"))
  }

  // ---- streaming twin ------------------------------------------------------

  test("streaming windows score list-mass drift against the frozen " +
    "profile: the skewed window fires, the reference-like one doesn't") {
    implicit val sqlCtx = spark.sqlContext
    def t(s: String) = Timestamp.valueOf(s)
    // reference: balanced across the two lists
    val refVecs = vecs2d((1L, 1f, 0f), (2L, 0.9f, 0.1f),
      (3L, 0f, 1f), (4L, 0.1f, 0.9f))
    val refP = EmbeddingDrift.profile(refVecs, cents)
    // window A balanced like the reference; window B all list-0
    val wA = Seq(Seq(1f, 0f), Seq(0.9f, 0.2f), Seq(0f, 1f), Seq(0.2f, 0.9f))
      .map(e => EmbEv(t("2024-01-01 10:02:00"), e))
    val wB = Seq(Seq(1f, 0f), Seq(0.9f, 0f), Seq(1.1f, 0.1f), Seq(0.95f, 0f))
      .map(e => EmbEv(t("2024-01-01 10:14:00"), e))
    val sentinel = EmbEv(t("2024-01-02 10:00:00"), Seq(1f, 0f))
    val collected =
      collection.mutable.ArrayBuffer.empty[org.apache.spark.sql.Row]
    val mem = MemoryStream[EmbEv]
    val q = EmbeddingDrift.monitorStream(mem.toDS().toDF(), "ts",
        cents, refP, windowDuration = "10 minutes",
        delayThreshold = "1 minute") { df =>
      collected ++= df.collect()
    }.queryName("emb_drift_mon").start()
    try {
      mem.addData(wA ++ wB: _*)
      q.processAllAvailable()
      mem.addData(sentinel)
      q.processAllAvailable()
    } finally q.stop()
    val byWin = collected.map(r =>
      r.getAs[Timestamp]("window_start") -> r.getAs[Double]("psi")).toMap
    assert(byWin.keySet == Set(t("2024-01-01 10:00:00"),
      t("2024-01-01 10:10:00")), byWin.toString)
    val (psiA, psiB) = (byWin(t("2024-01-01 10:00:00")),
      byWin(t("2024-01-01 10:10:00")))
    assert(psiB > psiA, s"skewed window $psiB must out-score balanced $psiA")
    assert(psiA < 0.1, s"balanced window reads stable: $psiA")
  }
}
