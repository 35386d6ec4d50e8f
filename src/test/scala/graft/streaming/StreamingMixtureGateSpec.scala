package graft.streaming

import graft.SparkSpec
import graft.operators.CurationOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The mixture gate needs no streaming twin CLASS: `mixtureSample` is a
  * stream-static broadcast join plus a row-local projection — stateless
  * by construction, so the exact batch function runs unchanged on a
  * streaming frame (the G11 structural-parity idea taken to its limit:
  * not a shared expression tree, the SAME operator). This spec pins
  * that: per-row keep verdicts on a stream equal the batch run, in the
  * arrival batch, with no state store and no watermark. */
class StreamingMixtureGateSpec extends SparkSpec {

  test("mixtureSample runs UNCHANGED on a stream; verdicts match batch in the arrival batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq.tabulate(200) { i =>
      (i.toLong, Seq("wiki", "crawl", "books", "unlisted")(i % 4))
    }.toDF("doc_id", "source")
    val mixture = Seq(("wiki", 1000L), ("crawl", 250L), ("books", 500L))
      .toDF("source", "keep_per_mille")
    val batch = CurationOps.mixtureSample(docs, mixture)
      .select("doc_id", "keep").as[(Long, Boolean)].collect().toMap

    val mem = MemoryStream[(Long, String)]
    val q = CurationOps.mixtureSample(
        mem.toDS().toDF("doc_id", "source"), mixture)
      .select("doc_id", "keep")
      .writeStream.outputMode("append").format("memory")
      .queryName("mixture_stream").start()
    try {
      mem.addData(docs.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val online = spark.table("mixture_stream")
        .as[(Long, Boolean)].collect().toMap
      assert(online === batch,
        "streaming keep verdicts diverged from the batch operator")
      // the gate discriminates on this input (not vacuously all-true/false)
      assert(online.values.exists(identity) && online.values.exists(!_))
      // stateless: the plan must carry no streaming state store
      assert(q.lastProgress.stateOperators.isEmpty,
        s"unexpected state operator: ${q.lastProgress}")
    } finally q.stop()
  }

  test("mixtureRepeat (oversampling explode) runs UNCHANGED on a stream, stateless") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Seq.tabulate(120) { i =>
      (i.toLong, Seq("wiki", "crawl", "books")(i % 3))
    }.toDF("doc_id", "source")
    // wiki repeats 2.5 epochs — the explode fan-out must be just as
    // stream-transparent as the keep projection
    val mixture = Seq(("wiki", 2500L), ("crawl", 250L), ("books", 1000L))
      .toDF("source", "keep_per_mille")
    val batch = CurationOps.mixtureRepeat(docs, mixture)
      .select("doc_id", "epoch").as[(Long, Long)].collect().sorted

    val mem = MemoryStream[(Long, String)]
    val q = CurationOps.mixtureRepeat(
        mem.toDS().toDF("doc_id", "source"), mixture)
      .select("doc_id", "epoch")
      .writeStream.outputMode("append").format("memory")
      .queryName("mixture_repeat_stream").start()
    try {
      mem.addData(docs.as[(Long, String)].collect().toSeq: _*)
      q.processAllAvailable()
      val online = spark.table("mixture_repeat_stream")
        .as[(Long, Long)].collect().sorted
      assert(online === batch,
        "streaming (doc, epoch) rows diverged from the batch operator")
      // oversampling actually happened: more rows than wiki docs
      assert(online.count(_._2 >= 1) > 0 && online.exists(_._2 == 2L))
      assert(q.lastProgress.stateOperators.isEmpty,
        s"unexpected state operator: ${q.lastProgress}")
    } finally q.stop()
  }
}
