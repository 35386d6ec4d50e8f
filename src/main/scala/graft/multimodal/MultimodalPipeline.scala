package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column pipeline (SURVEY §2 F2): media as opaque `binary`
  * payloads + typed metadata, with decode/feature-extract running
  * per-partition in batches (the Scala analogue of `mapInPandas`: one
  * iterator pass per partition, no per-row JVM/library round-trips).
  *
  * The actual media decode is STUBBED — this container ships no
  * image/audio codecs — behind [[FakeDecoder]], a deterministic
  * hash-derived stand-in with the same signature a real header-parse +
  * pixel-decode would have. Everything around it (schema, batching,
  * partition-level execution, output contract) is real Spark and tested.
  */
object MultimodalPipeline {

  val mediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("payload", BinaryType, nullable = false),
    StructField("media_type", StringType, nullable = false)))

  val decodedSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("media_type", StringType, nullable = false),
    StructField("n_bytes", IntegerType, nullable = false),
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false),
    StructField("n_frames", IntegerType, nullable = false),
    StructField("feature", ArrayType(FloatType), nullable = false)))

  /** STUB decoder: a real implementation would parse the container header
    * and decode pixels/samples here. Deterministic on payload bytes. */
  object FakeDecoder {
    def decode(payload: Array[Byte]): (Int, Int, Int, Array[Float]) = {
      val md = java.security.MessageDigest.getInstance("MD5").digest(payload)
      def u16(i: Int): Int = ((md(i) & 0xff) << 8) | (md(i + 1) & 0xff)
      val width = u16(0) % 512 + 1
      val height = u16(2) % 512 + 1
      val frames = u16(4) % 16 + 1
      // 8-dim "embedding" from the digest — stands in for a pooled feature map
      val feat = (0 until 8).map(i => ((md(i * 2) & 0xff) / 255.0f)).toArray
      (width, height, frames, feat)
    }
  }

  /** Wrap a text/documents table as a media table (payload = utf8 bytes)
    * — used by tests; a real ingest would read image/audio files. */
  def asMediaTable(documents: DataFrame): DataFrame =
    documents.select(col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      lit("image/fake").as("media_type"))

  /** Partition-batched decode: one pass per partition, rows emitted
    * lazily — the plumbing a Pandas-UDF `mapInPandas` would provide. */
  def decodeAll(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(decodedSchema)
    media.select("media_id", "payload", "media_type")
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]]("payload")
          val (w, h, f, feat) = FakeDecoder.decode(payload)
          Row(r.getAs[Long]("media_id"), r.getAs[String]("media_type"),
            payload.length, w, h, f, feat)
        }
      }(enc)
  }

  /** Resize/frame-sample metadata transform on the decoded relation —
    * pure column arithmetic, stays in whole-stage codegen. */
  def thumbnailPlan(decoded: DataFrame, maxDim: Int): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxDim) / greatest(col("width"), col("height")).cast("double"))
    decoded.withColumn("thumb_width", ceil(col("width") * scale).cast("int"))
      .withColumn("thumb_height", ceil(col("height") * scale).cast("int"))
      .withColumn("sampled_frames", least(col("n_frames"), lit(4)))
  }
}
