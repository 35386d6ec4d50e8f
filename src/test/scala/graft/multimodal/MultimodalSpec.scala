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

  test("real image decode: ImageIO pixels, channel means, quadrant lumas, aspect") {
    import java.awt.image.BufferedImage
    import java.io.ByteArrayOutputStream
    import javax.imageio.ImageIO
    def png(img: BufferedImage): Array[Byte] = {
      val out = new ByteArrayOutputStream()
      ImageIO.write(img, "png", out)
      out.toByteArray
    }
    // 8x4 solid red
    val red = new BufferedImage(8, 4, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 4; x <- 0 until 8) red.setRGB(x, y, 0xff0000)
    // 6x6 top half black, bottom half white
    val split2 = new BufferedImage(6, 6, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 6)
      split2.setRGB(x, y, if (y < 3) 0x000000 else 0xffffff)

    val rows = Seq((1L, png(red), "image/png"), (2L, png(split2), "image/png"),
      (3L, "not an image".getBytes("UTF-8"), "image/png"))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3))),
      MultimodalPipeline.mediaSchema)
    val decoded = MultimodalPipeline.decodeImages(media)
      .collect().map(r => r.getLong(0) -> r).toMap

    val r1 = decoded(1L)
    assert(r1.getInt(3) === 8 && r1.getInt(4) === 4 && r1.getInt(5) === 1)
    val f1 = r1.getSeq[Float](6)
    assert(math.abs(f1(0) - 1.0f) < 1e-3, s"mean R of solid red: ${f1(0)}")
    assert(math.abs(f1(1)) < 1e-3 && math.abs(f1(2)) < 1e-3)
    assert(math.abs(f1(7) - 2.0f) < 1e-6, "aspect ratio 8/4")
    // all four quadrants have the red luma 0.299
    (3 to 6).foreach(i => assert(math.abs(f1(i) - 0.299f) < 1e-3))

    val f2 = decoded(2L).getSeq[Float](6)
    assert(math.abs(f2(3)) < 1e-3 && math.abs(f2(4)) < 1e-3, "top quadrants black")
    assert(math.abs(f2(5) - 1.0f) < 1e-3 && math.abs(f2(6) - 1.0f) < 1e-3, "bottom white")

    // undecodable payload is kept, flagged with zero dims — not dropped
    val r3 = decoded(3L)
    assert(r3.getString(1) === "undecodable" && r3.getInt(3) === 0)

    // JPEG round-trips through the same decoder (lossy: loose tolerance)
    val jout = new ByteArrayOutputStream()
    ImageIO.write(red, "jpg", jout)
    val jmedia = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(
        org.apache.spark.sql.Row(9L, jout.toByteArray, "image/jpeg"))),
      MultimodalPipeline.mediaSchema)
    val j = MultimodalPipeline.decodeImages(jmedia).collect().head
    assert(j.getInt(3) === 8 && j.getInt(4) === 4)
    assert(math.abs(j.getSeq[Float](6)(0) - 1.0f) < 0.1, "JPEG red channel")
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
    // text payloads are not audio: the real decoder keeps every row and
    // flags it (sample_rate = 0) — corrupt-input rates stay measurable
    val audio = MultimodalPipeline.decodeAudio(media).cache()
    assert(audio.schema === MultimodalPipeline.audioSchema)
    assert(audio.count() === media.count())
    assert(audio.filter(col("sample_rate") =!= 0 || col("n_channels") =!= 0).count() === 0)
    assert(audio.filter(size(col("feature")) =!= 8).count() === 0)
    assert(audio.except(MultimodalPipeline.decodeAudio(media)).count() === 0)

    // text payloads are not AVI: the real video decoder keeps every row
    // and flags it (fps = 0) — same convention as the audio path
    val video = MultimodalPipeline.decodeVideo(media).cache()
    assert(video.schema === MultimodalPipeline.videoSchema)
    assert(video.count() === media.count())
    assert(video.filter(col("fps") =!= 0.0f || col("n_frames") =!= 0).count() === 0)
    assert(video.filter(size(col("feature")) =!= 8).count() === 0)
    assert(video.except(MultimodalPipeline.decodeVideo(media)).count() === 0)
  }

  test("real audio decode: WAV/AIFF PCM frames, RMS/peak/ZCR/clipping, duration") {
    import javax.sound.sampled._
    // synthesize a container: 16-bit PCM samples -> WAV (little-endian)
    // or AIFF (big-endian) bytes via the same JDK writer users would hit
    def audioBytes(rate: Float, channels: Int, samples: Array[Short],
        fileType: AudioFileFormat.Type, bigEndian: Boolean): Array[Byte] = {
      val fmt = new AudioFormat(rate, 16, channels, true, bigEndian)
      val bytes = new Array[Byte](samples.length * 2)
      for (i <- samples.indices) {
        val (hi, lo) = ((samples(i) >> 8).toByte, samples(i).toByte)
        if (bigEndian) { bytes(2 * i) = hi; bytes(2 * i + 1) = lo }
        else { bytes(2 * i) = lo; bytes(2 * i + 1) = hi }
      }
      val ais = new AudioInputStream(new java.io.ByteArrayInputStream(bytes),
        fmt, samples.length / channels)
      val out = new java.io.ByteArrayOutputStream()
      AudioSystem.write(ais, fileType, out)
      out.toByteArray
    }
    // mono half-scale square wave, 1 s at 8 kHz: every stat is an exact
    // binary fraction (16384/32768 = 0.5), so equality is exact
    val square = Array.tabulate(8000)(i => if (i % 2 == 0) 16384 else -16384).map(_.toShort)
    // stereo, 100 ms at 44.1 kHz: left silent, right pinned at full scale
    val stereo = Array.tabulate(8820)(i => if (i % 2 == 0) 0 else 32767).map(_.toShort)
    val rows = Seq(
      (1L, audioBytes(8000f, 1, square, AudioFileFormat.Type.WAVE, bigEndian = false), "audio/wav"),
      (2L, audioBytes(44100f, 2, stereo, AudioFileFormat.Type.WAVE, bigEndian = false), "audio/wav"),
      (3L, audioBytes(8000f, 1, square, AudioFileFormat.Type.AIFF, bigEndian = true), "audio/aiff"),
      (4L, "not audio".getBytes("UTF-8"), "audio/wav"))
    val media = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r =>
        org.apache.spark.sql.Row(r._1, r._2, r._3))),
      MultimodalPipeline.mediaSchema)
    val decoded = MultimodalPipeline.decodeAudio(media)
      .collect().map(r => r.getLong(0) -> r).toMap

    for (id <- Seq(1L, 3L)) { // WAV and AIFF carry the same frames
      val r = decoded(id)
      assert(r.getInt(2) === 8000 && r.getInt(3) === 1, s"rate/channels of $id")
      assert(r.getInt(4) === 1000, s"duration of $id")
      val f = r.getSeq[Float](5)
      assert(f(0) === 0.5f && f(1) === 0.5f, s"RMS of half-scale square: ${f(0)}")
      assert(f(2) === 0.5f && f(3) === 0.5f, s"peak: ${f(2)}")
      assert(f(4) === 0.0f, s"DC offset of a symmetric square: ${f(4)}")
      assert(f(5) === 1.0f, s"ZCR of an every-sample flip: ${f(5)}")
      assert(f(6) === 0.0f, s"no clipping at half scale: ${f(6)}")
    }
    val s = decoded(2L)
    assert(s.getInt(2) === 44100 && s.getInt(3) === 2)
    assert(s.getInt(4) === 100, "4410 frames at 44.1 kHz")
    val fs = s.getSeq[Float](5)
    assert(fs(0) === 0.0f && fs(2) === 0.0f, "silent left channel")
    assert(math.abs(fs(1) - 32767f / 32768f) < 1e-6 &&
      math.abs(fs(3) - 32767f / 32768f) < 1e-6, "full-scale right channel")
    assert(math.abs(fs(4) - 32767.0 / 65536) < 1e-6, "mean over both channels")
    assert(fs(5) === 0.0f, "ZCR over the silent channel")
    assert(fs(6) === 0.5f, "right channel fully clipped, left clean")
    // undecodable payload kept + flagged, not dropped
    val bad = decoded(4L)
    assert(bad.getInt(2) === 0 && bad.getInt(3) === 0 && bad.getInt(4) === 0)
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
