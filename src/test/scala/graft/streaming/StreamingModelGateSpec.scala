package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.{NgramLm, QualityClassifier}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The model gates' streaming parity is structural (foreachBatch runs
  * the batch operator), so what needs proof is the WIRING: verdicts
  * arrive per micro-batch, agree bit-for-bit with offline scoring of
  * the same documents, survive the save→load artifact round-trip, and
  * are independent of how the stream is batched.
  */
class StreamingModelGateSpec extends SparkSpec {
  import spark.implicits._

  /** Real docs vs word-mangled copies — the constructed label with
    * actual textual signal (the QualityClassifierSpec corpus; the
    * testdata's `lang` column is uncorrelated with its shared-vocabulary
    * synthetic text). */
  private lazy val labeled = {
    val docs = Tables.documents(spark, sf)
    val pos = docs.filter(col("doc_id") < 200)
      .select(col("doc_id"), col("text"), lit(true).as("label"))
    val neg = docs.filter(col("doc_id") >= 200 && col("doc_id") < 400)
      .select(col("doc_id"),
        expr("array_join(transform(filter(split(text, ' '), " +
          "w -> length(w) > 0), w -> concat(w, 'q')), ' ')").as("text"),
        lit(false).as("label"))
    pos.unionByName(neg).cache()
  }

  test("classifier gate: per-batch verdicts ≡ offline score+paretoKeep over a loaded artifact, across an arbitrary batch split") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("qc-gate").toString
    QualityClassifier.save(
      QualityClassifier.train(labeled, dim = 1 << 14, order = 2), dir)
    val model = QualityClassifier.load(spark, dir)

    val offline = QualityClassifier.paretoKeep(
        QualityClassifier.score(labeled, model), seed = 5L)
      .select("doc_id", "log_odds", "keep")
      .as[(Long, Double, Boolean)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap

    val rows = labeled.select("doc_id", "text").as[(Long, String)].collect()
    val got = scala.collection.mutable.Map.empty[Long, (Double, Boolean)]
    var batches = 0
    val mem = MemoryStream[(Long, String)]
    val q = StreamingModelGate.classifier(
        mem.toDS().toDF("doc_id", "text"), model, seed = 5L) {
      (out: DataFrame, _: Long) =>
        got.synchronized {
          out.select("doc_id", "log_odds", "keep")
            .as[(Long, Double, Boolean)].collect()
            .foreach(r => got(r._1) = (r._2, r._3))
          batches += 1
        }
    }.start()
    try {
      // two arrival batches — verdicts must not depend on the split
      mem.addData(rows.take(60).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(60).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(batches >= 2, s"expected at least two micro-batches, saw $batches")
    assert(got.keySet === offline.keySet)
    got.foreach { case (id, v) => assert(v === offline(id), s"doc $id") }
    assert(got.values.exists(_._2) && got.values.exists(!_._2),
      "gate should both keep and drop on this corpus")
  }

  test("perplexity gate: per-batch ppl ≡ offline NgramLm.score over a loaded artifact; keep is the maxPpl cut") {
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("lm-gate").toString
    // train on the trusted (real) half only — mangled docs are all-OOV
    // under it and must out-ppl
    NgramLm.save(NgramLm.train(labeled.filter(col("label")), order = 2), dir)
    val model = NgramLm.load(spark, dir)

    val offline = NgramLm.score(labeled, model)
      .select("doc_id", "ppl").as[(Long, Double)].collect().toMap
    val cut = offline.values.toSeq.sorted.apply(offline.size / 2)

    val rows = labeled.select("doc_id", "text").as[(Long, String)].collect()
    val got = scala.collection.mutable.Map.empty[Long, (Double, Boolean)]
    val mem = MemoryStream[(Long, String)]
    val q = StreamingModelGate.perplexity(
        mem.toDS().toDF("doc_id", "text"), model, maxPpl = cut) {
      (out: DataFrame, _: Long) =>
        got.synchronized {
          out.select("doc_id", "ppl", "keep")
            .as[(Long, Double, Boolean)].collect()
            .foreach(r => got(r._1) = (r._2, r._3))
        }
    }.start()
    try {
      mem.addData(rows.take(97).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(97).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.keySet === offline.keySet)
    got.foreach { case (id, (p, k)) =>
      assert(p === offline(id), s"doc $id ppl")
      assert(k === (p <= cut), s"doc $id keep")
    }
    // the trusted-corpus model actually discriminates online
    val labels = labeled.select("doc_id", "label").as[(Long, Boolean)]
      .collect().toMap
    val keptReal = got.count { case (id, (_, k)) => k && labels(id) }
    val keptJunk = got.count { case (id, (_, k)) => k && !labels(id) }
    assert(keptReal > keptJunk,
      s"real docs should dominate the kept set: $keptReal vs $keptJunk")
  }

  test("line gate: per-batch cleaning ≡ offline dedupLinesAgainst over a loaded index; stream-only duplication never excises") {
    implicit val sqlCtx = spark.sqlContext
    import graft.operators.LineDedup
    // chrome-seeded corpus; the index is fit offline and persisted
    val docs = Tables.documents(spark, sf).filter(col("doc_id") < 120)
      .select(col("doc_id"), concat(lit("NAVBAR HOME\n"), col("text"),
        lit("\nFOOTER LINE")).as("text")).cache()
    val dir = java.nio.file.Files.createTempDirectory("line-gate").toString
    LineDedup.save(LineDedup.boilerplateIndex(docs, minDocs = 2L), dir)
    val index = LineDedup.load(spark, dir)
    // two docs sharing a line ONLY with each other inside the stream —
    // the frozen index must not excise it
    val fresh = Seq(
      (900001L, "fresh shared line\nbody number one"),
      (900002L, "fresh shared line\nbody number two")).toDF("doc_id", "text")
    val all = docs.unionByName(fresh).cache()
    val offline = LineDedup.dedupLinesAgainst(all, index)
      .as[(Long, String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    val rows = all.as[(Long, String)].collect()
    val got = scala.collection.mutable.Map.empty[Long, (String, Long, Long)]
    val mem = MemoryStream[(Long, String)]
    val q = StreamingModelGate.lines(
        mem.toDS().toDF("doc_id", "text"), index) {
      (out: DataFrame, _: Long) =>
        got.synchronized {
          out.as[(Long, String, Long, Long)].collect()
            .foreach(r => got(r._1) = (r._2, r._3, r._4))
        }
    }.start()
    try {
      mem.addData(rows.take(45).toSeq: _*)
      q.processAllAvailable()
      mem.addData(rows.drop(45).toSeq: _*)
      q.processAllAvailable()
    } finally q.stop()
    assert(got.keySet === offline.keySet)
    got.foreach { case (id, v) => assert(v === offline(id), s"doc $id") }
    // the chrome actually excised online, and the stream-only shared
    // line survived verbatim
    assert(got.count(_._2._3 > 0) >= 120)
    assert(got(900001L) === (("fresh shared line\nbody number one", 2L, 0L)))
    assert(got(900002L) === (("fresh shared line\nbody number two", 2L, 0L)))
  }
}
