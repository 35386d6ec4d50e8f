package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.Contamination
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamingContaminationSpec extends SparkSpec {
  import StreamingContamination._

  private def t(s: String) = Timestamp.valueOf(s)

  test("streaming verdicts match the batch contamination operator") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    // same split the batch query uses: every 50th doc is benchmark
    val docs = Tables.documents(spark, sf)
    val bench = docs.filter(col("doc_id") % 50 === 0)
      .select(col("doc_id").as("bench_id"), col("text"))
    val corpus = docs.filter(col("doc_id") % 50 =!= 0)

    val batch = Contamination.contamination(corpus, bench)
      .select("doc_id", "n_shingles", "n_contaminated",
        "worst_bench_id", "worst_overlap")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap

    val rows = corpus.select("doc_id", "text").collect()
      .map(r => DocRow(r.getLong(0), t("2024-01-01 10:00:00"), r.getString(1)))
    val mem = MemoryStream[DocRow]
    val q = contaminated(mem.toDS(), bench).writeStream
      .outputMode("append").format("memory").queryName("contam_stream").start()
    try {
      mem.addData(rows.toSeq: _*)
      q.processAllAvailable()
      val online = spark.table("contam_stream")
        .select("doc_id", "n_shingles", "n_contaminated",
          "worst_bench_id", "worst_overlap")
        .collect().map(r => r.getLong(0) ->
          (r.getInt(1).toLong, r.getLong(2), r.getLong(3), r.getLong(4))).toMap
      assert(online.keySet === batch.keySet,
        s"flagged sets differ: online-only=${online.keySet -- batch.keySet} batch-only=${batch.keySet -- online.keySet}")
      online.foreach { case (id, v) =>
        assert(v === batch(id), s"doc $id: online $v != batch ${batch(id)}")
      }
      assert(online.nonEmpty, "expected at least one contaminated doc in the corpus")
    } finally q.stop()
  }

  test("stateless emission: a doc's verdict arrives in its own micro-batch") {
    implicit val sqlCtx = spark.sqlContext
    import spark.implicits._
    val benchText = "alpha beta gamma delta epsilon zeta eta theta"
    val bench = Seq((1000L, benchText)).toDF("bench_id", "text")
    val mem = MemoryStream[DocRow]
    val q = contaminated(mem.toDS(), bench).writeStream
      .outputMode("append").format("memory").queryName("contam_one").start()
    try {
      mem.addData(DocRow(1L, t("2024-01-01 10:00:00"), benchText + " extra tail"))
      q.processAllAvailable() // no watermark advance, no second batch
      val got = spark.table("contam_one").collect()
      assert(got.length === 1 && got.head.getLong(0) === 1L)
      // clean doc: nothing emitted
      mem.addData(DocRow(2L, t("2024-01-01 10:01:00"),
        "completely different words in every single position here"))
      q.processAllAvailable()
      assert(spark.table("contam_one").count() === 1)
    } finally q.stop()
  }
}
