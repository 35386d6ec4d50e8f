package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.QualityOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingQualityGateSpec extends SparkSpec {

  test("streaming flags match the batch quality_gopher verdicts") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    val batch = QualityOps.qualityGopher(spark, sf)
      .select("doc_id", "pass", "flag_words", "flag_mwl", "flag_ttr", "flag_stop")
      .collect()
      .map(r => r.getLong(0) ->
        (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
      .toMap

    val rows = docs.collect().map(r => (r.getLong(0), r.getString(1)))
    val mem = MemoryStream[(Long, String)]
    val q = StreamingQualityGate
      .flags(mem.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory")
      .queryName("quality_stream").start()
    try {
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val online = spark.table("quality_stream")
        .select("doc_id", "pass", "flag_words", "flag_mwl", "flag_ttr", "flag_stop")
        .collect()
        .map(r => r.getLong(0) ->
          (r.getBoolean(1), r.getBoolean(2), r.getBoolean(3), r.getBoolean(4), r.getBoolean(5)))
        .toMap
      assert(online.keySet === batch.keySet)
      online.foreach { case (id, v) =>
        assert(v === batch(id), s"doc $id: online $v != batch ${batch(id)}")
      }
      // the gate must actually discriminate on this corpus
      assert(batch.values.exists(_._1) && batch.values.exists(!_._1),
        "expected both passing and failing documents")
    } finally q.stop()
  }

  test("stateless split: verdicts emit in the arrival batch, keep+reject partition the input") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, String)]
    // 40 distinct 4-char words + "the a": n_words=42, mwl=3.90, ttr=1.0,
    // stop_ratio=0.048 — clears every rule by a margin
    val good = (1L, ((1 to 40).map(i => f"ab$i%02d") ++ Seq("the", "a")).mkString(" "))
    val bad = (2L, "tiny doc")
    val qPass = StreamingQualityGate.passing(stream.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("gate_pass").start()
    val qRej = StreamingQualityGate.rejected(stream.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("gate_rej").start()
    try {
      stream.addData(good, bad)
      qPass.processAllAvailable(); qRej.processAllAvailable()
      val passed = spark.table("gate_pass").select("doc_id").collect().map(_.getLong(0)).toSet
      val rejected = spark.table("gate_rej").select("doc_id").collect().map(_.getLong(0)).toSet
      assert(passed === Set(1L), s"pass side: $passed")
      assert(rejected === Set(2L), s"reject side: $rejected")
    } finally { qPass.stop(); qRej.stop() }
  }
}
