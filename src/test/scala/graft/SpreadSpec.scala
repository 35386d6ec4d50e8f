package graft

/** Tables.spreadByKey gating (r19): the keyed spread exists to cure a
  * single-row-group scan (one task serializing heavy row-local work)
  * and must be a NO-OP when the source scan is already wide — at
  * production scale an unconditional spread would re-exchange the
  * whole corpus for nothing. */
class SpreadSpec extends SparkSpec {
  import org.apache.spark.sql.functions._

  test("narrow scan gets spread to full width") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text")
    // the driver testdata is a single row group: the scan is narrower
    // than half the cores, so the spread must fire at full width
    assume(docs.rdd.getNumPartitions * 2 <
      spark.sparkContext.defaultParallelism)
    val spread = Tables.spreadByKey(docs, "doc_id")
    assert(spread.rdd.getNumPartitions ===
      spark.sparkContext.defaultParallelism)
    assert(spread.queryExecution.executedPlan.toString.contains("Exchange"))
  }

  test("already-wide source is returned untouched (no exchange added)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-spread").toString
    // a multi-split fixture: as many files as the session has cores
    val n = spark.sparkContext.defaultParallelism
    spark.range(0, 1000).select(col("id").as("doc_id"),
        concat(lit("t"), col("id")).as("text"))
      .repartition(n)
      .write.mode("overwrite").parquet(dir)
    val wide = spark.read.parquet(dir)
    assume(wide.rdd.getNumPartitions * 2 >=
      spark.sparkContext.defaultParallelism)
    val out = Tables.spreadByKey(wide, "doc_id")
    // gated no-op: the SAME frame back, not a repartitioned copy
    assert(out eq wide)
  }
}
