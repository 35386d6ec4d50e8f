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
}
