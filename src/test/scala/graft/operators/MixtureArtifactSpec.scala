package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The mixture recipe is the dataset definition — its durable form must
  * round-trip exactly (a reloaded recipe drives mixtureSample /
  * mixtureRepeat to bit-identical samples), reject malformed tables
  * BEFORE committing, and follow the ModelStore generation/kind
  * conventions shared with the other artifacts.
  */
class MixtureArtifactSpec extends SparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft-mixart").toString

  private lazy val docs = Tables.documents(spark, sf)
    .select("doc_id", "source", "text").cache()

  private lazy val stats = docs
    .groupBy(col("source"))
    .agg(sum(size(split(col("text"), "\\s+")).cast("long")).as("n_tokens"))
    .cache()

  test("recipe round-trip: reloaded plan drives identical samples; weights round-trip through planMixture") {
    val path = tmp() + "/recipe"
    val wPath = tmp() + "/weights"
    val weights = CurationOps.temperatureWeights(stats, 0.5)
    MixtureArtifact.saveWeights(weights, wPath)
    val wBack = MixtureArtifact.loadWeights(spark, wPath)
    assert(wBack.as[(String, Double)].collect().sortBy(_._1).toSeq ===
      weights.as[(String, Double)].collect().sortBy(_._1).toSeq)

    val recipe = CurationOps.planMixture(stats, weights,
      targetTokens = 3000L, maxEpochs = 2)
    MixtureArtifact.saveRecipe(recipe, path, maxEpochs = 2)
    val back = MixtureArtifact.loadRecipe(spark, path)
    assert(back.as[(String, Long)].collect().sortBy(_._1).toSeq ===
      recipe.as[(String, Long)].collect().sortBy(_._1).toSeq)

    // the point of the artifact: a fresh consumer samples IDENTICALLY
    def sampled(r: org.apache.spark.sql.DataFrame) =
      CurationOps.mixtureRepeat(docs, r, qualifyMaxEpochs = 4)
        .select("doc_id", "epoch").as[(Long, Long)].collect().sorted.toSeq
    assert(sampled(back) === sampled(recipe))

    // planMixture over reloaded weights == over in-session weights
    val planned = CurationOps.planMixture(stats, wBack, 3000L, maxEpochs = 2)
    assert(planned.as[(String, Long)].collect().sortBy(_._1).toSeq ===
      recipe.as[(String, Long)].collect().sortBy(_._1).toSeq)
  }

  test("a bad table never commits: duplicates, out-of-range rates, empties, kind mismatch") {
    val path = tmp() + "/recipe"
    val good = Seq(("a", 500L), ("b", 1000L)).toDF("source", "keep_per_mille")
    MixtureArtifact.saveRecipe(good, path)

    intercept[IllegalArgumentException] { // duplicate source
      MixtureArtifact.saveRecipe(
        Seq(("a", 1L), ("a", 2L)).toDF("source", "keep_per_mille"), path)
    }
    intercept[IllegalArgumentException] { // rate past the maxEpochs cap
      MixtureArtifact.saveRecipe(
        Seq(("a", 1500L)).toDF("source", "keep_per_mille"), path)
    }
    intercept[IllegalArgumentException] { // negative rate
      MixtureArtifact.saveRecipe(
        Seq(("a", -1L)).toDF("source", "keep_per_mille"), path)
    }
    intercept[IllegalArgumentException] { // empty
      MixtureArtifact.saveRecipe(good.filter(lit(false)), path)
    }
    intercept[IllegalArgumentException] { // null source
      MixtureArtifact.saveRecipe(
        Seq((null: String, 10L)).toDF("source", "keep_per_mille"), path)
    }
    // none of the failures committed: the good generation still serves
    assert(MixtureArtifact.loadRecipe(spark, path)
      .as[(String, Long)].collect().sortBy(_._1).toSeq ===
      Seq(("a", 500L), ("b", 1000L)))

    // weights validation + kind guard
    intercept[IllegalArgumentException] {
      MixtureArtifact.saveWeights(
        Seq(("a", -0.5)).toDF("source", "weight"), tmp() + "/w")
    }
    val wPath = tmp() + "/w2"
    MixtureArtifact.saveWeights(Seq(("a", 1.0)).toDF("source", "weight"), wPath)
    intercept[IllegalArgumentException] {
      MixtureArtifact.loadRecipe(spark, wPath) // wrong kind
    }
    intercept[IllegalArgumentException] {
      MixtureArtifact.loadWeights(spark, tmp() + "/nothing") // no _meta
    }
  }

  test("generations: a re-save supersedes; maxEpochs recorded; oversampling rates legal under it") {
    val path = tmp() + "/recipe"
    MixtureArtifact.saveRecipe(
      Seq(("a", 100L)).toDF("source", "keep_per_mille"), path)
    MixtureArtifact.saveRecipe(
      Seq(("a", 2500L)).toDF("source", "keep_per_mille"), path, maxEpochs = 3)
    assert(MixtureArtifact.loadRecipe(spark, path)
      .as[(String, Long)].collect().toSeq === Seq(("a", 2500L)))
  }
}
