package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Runnable walkthrough of the streaming near-dedup surface: streams the
  * documents table through a real file source (one file per micro-batch)
  * into StreamingNearDedup.candidatePairs and prints the online
  * candidate pairs.
  *
  * Usage: sbt "runMain graft.streaming.StreamingDemo [sfDir]"
  */
object StreamingDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    // stage the static table as a streamable directory with a synthetic
    // event time, then read it back as a file-source stream
    val stage = java.nio.file.Files.createTempDirectory("graft-stream").toString
    graft.Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        expr("TIMESTAMP '2024-01-01 00:00:00' + make_interval(0, 0, 0, 0, 0, 0, doc_id)").as("ts"),
        col("text"))
      .write.mode("overwrite").parquet(stage)

    val docs = spark.readStream
      .schema("doc_id BIGINT, ts TIMESTAMP, text STRING")
      .option("maxFilesPerTrigger", 1)
      .parquet(stage)
      .as[StreamingNearDedup.StreamDoc]

    val q = StreamingNearDedup.candidatePairs(docs)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_pairs").start()
    q.processAllAvailable()
    val pairs = spark.table("stream_pairs")
    println(s"online candidate pairs: ${pairs.count()}")
    pairs.select("id_a", "id_b").distinct().orderBy("id_a", "id_b")
      .show(10, truncate = false)
    q.stop()

    val qv = StreamingNearDedup.verifiedPairs(docs, threshold = 0.5)
      .writeStream.outputMode("append")
      .format("memory").queryName("stream_verified").start()
    qv.processAllAvailable()
    val verified = spark.table("stream_verified")
      .select("id_a", "id_b", "jaccard").distinct()
    println(s"online VERIFIED pairs (jaccard >= 0.5): ${verified.count()}")
    verified.orderBy("id_a", "id_b").show(10, truncate = false)
    qv.stop()
    spark.stop()
  }
}
