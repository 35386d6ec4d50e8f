package graft.multimodal

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class MultimodalSpec extends SparkSpec {
  test("binary payload pipeline decodes deterministically with typed schema") {
    val media = MultimodalPipeline.asMediaTable(Tables.documents(spark, sf))
    assert(media.schema("payload").dataType.typeName === "binary")

    val decoded = MultimodalPipeline.decodeAll(media).cache()
    assert(decoded.schema === MultimodalPipeline.decodedSchema)
    assert(decoded.count() === media.count())
    // deterministic: same payload -> same fake dims
    val twice = MultimodalPipeline.decodeAll(media)
    assert(decoded.except(twice).count() === 0)
    // feature vector is fixed-width
    assert(decoded.filter(size(col("feature")) =!= 8).count() === 0)
    // dims in the documented stub ranges
    assert(decoded.filter(col("width") < 1 || col("width") > 512).count() === 0)
    assert(decoded.filter(col("n_frames") < 1 || col("n_frames") > 16).count() === 0)
  }

  test("thumbnail plan caps the max dimension and stays codegen-friendly") {
    val media = MultimodalPipeline.asMediaTable(Tables.documents(spark, sf))
    val thumbs = MultimodalPipeline.thumbnailPlan(
      MultimodalPipeline.decodeAll(media), maxDim = 128)
    assert(thumbs.filter(greatest(col("thumb_width"), col("thumb_height")) > 128).count() === 0)
    assert(thumbs.filter(col("sampled_frames") > 4).count() === 0)
    // aspect ratio approximately preserved for downscaled rows
    // orientation never strictly inverts (ceil is monotone under a shared
    // scale; quantization may merge to equality but cannot flip the order)
    val bad = thumbs.filter(
      (col("width") > col("height") && col("thumb_width") < col("thumb_height")) ||
      (col("width") < col("height") && col("thumb_width") > col("thumb_height"))).count()
    assert(bad === 0)
  }

  test("audio and video metadata extraction: typed schemas, deterministic") {
    val media = MultimodalPipeline.asMediaTable(Tables.documents(spark, sf))
    val audio = MultimodalPipeline.decodeAudio(media).cache()
    assert(audio.schema === MultimodalPipeline.audioSchema)
    assert(audio.count() === media.count())
    assert(audio.filter(!col("sample_rate").isin(8000, 16000, 22050, 44100)).count() === 0)
    assert(audio.filter(col("n_channels") < 1 || col("n_channels") > 2).count() === 0)
    assert(audio.filter(size(col("feature")) =!= 8).count() === 0)
    assert(audio.except(MultimodalPipeline.decodeAudio(media)).count() === 0)

    val video = MultimodalPipeline.decodeVideo(media).cache()
    assert(video.schema === MultimodalPipeline.videoSchema)
    assert(video.count() === media.count())
    assert(video.filter(col("fps") < 23 || col("fps") > 60).count() === 0)
    // duration consistent with frames/fps (integer truncation tolerance)
    assert(video.filter(
      abs(col("duration_ms") - col("n_frames") * 1000 / col("fps")) > 1).count() === 0)
  }

  test("batched extraction bounds batch rows AND payload bytes per batch") {
    val media = MultimodalPipeline.asMediaTable(Tables.documents(spark, sf))
    val maxRows = 7
    val maxBytes = 4096L
    // a probe decodeBatch that reports each batch's size back in the rows
    val probeSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("media_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("batch_rows", org.apache.spark.sql.types.IntegerType),
      org.apache.spark.sql.types.StructField("batch_bytes", org.apache.spark.sql.types.LongType)))
    val probed = MultimodalPipeline.decodeBatched(media, probeSchema, maxRows, maxBytes) {
      batch =>
        val bytes = batch.map(_._2.length.toLong).sum
        batch.map { case (id, _) =>
          org.apache.spark.sql.Row(id, batch.size, bytes) }
    }.cache()
    // no row lost, no duplicate
    assert(probed.count() === media.count())
    assert(probed.select("media_id").distinct().count() === media.count())
    // every batch respects both caps (no payload here exceeds maxBytes alone)
    assert(probed.filter(col("batch_rows") > maxRows).count() === 0)
    assert(probed.filter(col("batch_bytes") > maxBytes).count() === 0)
    // and batching actually groups (not a degenerate row-at-a-time path)
    assert(probed.agg(max(col("batch_rows"))).first().getInt(0) > 1)
  }
}
