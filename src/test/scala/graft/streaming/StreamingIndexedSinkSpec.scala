package graft.streaming

import graft.SparkSpec
import graft.sources.FileStatsIndex
import graft.sources.FileStatsIndex._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

class StreamingIndexedSinkSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(): String =
    java.nio.file.Files.createTempDirectory("graft-ssink").toString

  test("per-batch manifest maintenance: the table is skip-queryable " +
    "after every micro-batch, and readSince sees exactly the new batch") {
    implicit val sqlCtx = spark.sqlContext
    val dir = tmp(); val cp = tmp()
    val in = MemoryStream[(Long, Double)]
    val stream = in.toDF().toDF("doc_id", "v")
    val q = StreamingIndexedSink.writer(stream, dir, Seq("doc_id", "v"), cp)
      .start()
    try {
      in.addData((0L until 500L).map(i => (i, i / 10.0)))
      q.processAllAvailable()
      val idx1 = FileStatsIndex.loadIndex(spark, dir)
      // materialize NOW: a lazy frame over _stats_index dies at the
      // next saveIndex swap — the documented manifest-read contract
      // (load fresh per query; never hold a manifest plan across
      // commits)
      val rows1 = idx1.orderBy("file", "column").collect().toSet
      val batch1Files = rows1.map(_.getString(0))
      assert(batch1Files.nonEmpty)
      // skip-queryable mid-stream
      assert(readPruned(spark, dir, idx1,
        Seq(LongBound("doc_id", Some(100L), Some(200L))))
        .filter($"doc_id".between(100, 200)).count() == 101)

      in.addData((500L until 800L).map(i => (i, i / 10.0)))
      q.processAllAvailable()
      val idx2 = FileStatsIndex.loadIndex(spark, dir)
      assert(idx2.select("file").distinct().count() > batch1Files.size)
      // the HWM read lists only batch-2 files
      val delta = readSince(spark, dir, idx2, "doc_id", hwm = 499L)
      assert(delta.select("doc_id").as[Long].collect().sorted.toSeq ==
        (500L until 800L).toSeq)
      assert(delta.inputFiles.forall(f => !batch1Files.contains(f)),
        "delta read must not touch batch-1 files")
      // manifest rows for batch-1 files carried over VERBATIM (no
      // re-scan of committed files)
      assert(rows1.subsetOf(idx2.collect().toSet))
      // and the manifest matches a cold crawl exactly
      assert(idx2.orderBy("file", "column").collect().toSeq ==
        FileStatsIndex.build(spark, dir, Seq("doc_id", "v"))
          .orderBy("file", "column").collect().toSeq)
    } finally q.stop()
  }

  test("batch and streaming share one body: appendIndexed is the " +
    "foreachBatch definition") {
    val dir = tmp()
    StreamingIndexedSink.appendIndexed(
      spark.range(0, 100).toDF("doc_id")
        .withColumn("v", col("doc_id").cast("double")),
      dir, Seq("doc_id"))
    StreamingIndexedSink.appendIndexed(
      spark.range(100, 150).toDF("doc_id")
        .withColumn("v", col("doc_id").cast("double")),
      dir, Seq("doc_id"))
    val idx = FileStatsIndex.loadIndex(spark, dir)
    assert(spark.read.parquet(dir).count() == 150)
    assert(readSince(spark, dir, idx, "doc_id", 99L).count() == 50)
  }
}
