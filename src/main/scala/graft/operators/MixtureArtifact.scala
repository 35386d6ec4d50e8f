package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable form of the E18 mixture artifacts — the recipe
  * ([[CurationOps.planMixture]]'s (source, keep_per_mille) output) and
  * the weights table ([[CurationOps.temperatureWeights]]'s (source,
  * weight)) — on the [[ModelStore]] `_meta` atomic-commit convention.
  *
  * Why these deserve an artifact: a mixture recipe IS the dataset
  * definition. The published recipes (the temperature-sampled
  * multilingual mixes, the "N epochs of curated text" weightings) are
  * decided once, reviewed, and then applied verbatim by every
  * downstream job — the per-batch streaming gate, the nightly
  * tokenize+pack run, a reproduction months later. Re-planning from
  * live stats in each session would silently shift the mixture as the
  * corpus grows (planMixture is a function of CURRENT availability);
  * persisting the planned rates freezes the dataset definition the way
  * the reference freezes each feature version (models.py:45-62).
  *
  * Both tables are domains-sized (KBs) — one file per generation, the
  * corpus is never touched. A frame that lacks the contract columns,
  * carries duplicate sources, or holds out-of-range rates fails BEFORE
  * the meta swap — nothing commits (the save-certifies-the-artifact
  * convention). Round-trip parity is spec'd from a fresh store path:
  * `mixtureSample`/`mixtureRepeat` over `loadRecipe` ≡ over the
  * in-session plan, bit-identical.
  */
object MixtureArtifact {

  /** Persist a recipe frame (source, keep_per_mille). `maxEpochs`
    * bounds the legal rate exactly as [[CurationOps.planMixture]]'s
    * cap does (1000·maxEpochs); pass the value the plan was made with
    * so a corrupted or hand-edited recipe cannot commit. */
  def saveRecipe(recipe: DataFrame, path: String, maxEpochs: Int = 1): Unit = {
    require(maxEpochs >= 1, s"maxEpochs $maxEpochs must be >= 1")
    val spark = recipe.sparkSession
    ModelStore.withLock(spark, path, "mixture recipe") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "recipe")
      recipe.select(col("source").cast("string").as("source"),
          col("keep_per_mille").cast("long").as("keep_per_mille"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val cap = 1000L * maxEpochs
      val n = validateKeyed(spark, dir, "keep_per_mille",
        c => c >= 0L && c <= cap, s"in [0, $cap] (maxEpochs=$maxEpochs)")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "mixture_recipe", "gen" -> g.toString,
        "nSources" -> n.toString, "maxEpochs" -> maxEpochs.toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a committed recipe — the frame [[CurationOps.mixtureSample]]
    * / [[CurationOps.mixtureRepeat]] take, lazily over the committed
    * generation (readable across one subsequent save; keep-two). */
  def loadRecipe(spark: SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "mixture recipe")
    ModelStore.checkKind(kv, path, "mixture_recipe", "1")
    spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "recipe"))
  }

  /** Persist a weights frame (source, weight ≥ 0) — the reviewed input
    * to [[CurationOps.planMixture]], e.g. `temperatureWeights` output.
    * Persisting weights AND recipe captures both halves of the
    * decision: what was intended (weights) and what was feasible
    * against that day's availability (recipe). */
  def saveWeights(weights: DataFrame, path: String): Unit = {
    val spark = weights.sparkSession
    ModelStore.withLock(spark, path, "mixture weights") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "weights")
      weights.select(col("source").cast("string").as("source"),
          col("weight").cast("double").as("weight"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val n = validateKeyed(spark, dir, "weight",
        c => c >= 0.0 && !isnan(c), "finite and >= 0")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "mixture_weights", "gen" -> g.toString,
        "nSources" -> n.toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen committed weights — feed straight to planMixture. */
  def loadWeights(spark: SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "mixture weights")
    ModelStore.checkKind(kv, path, "mixture_weights", "1")
    spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "weights"))
  }

  /** Shared read-back validation on the files just written (the
    * save-certifies convention): non-empty, unique non-null sources,
    * values passing the range predicate (a Column predicate — stays in
    * codegen). Returns the row count for `_meta`. Fails (→ no commit)
    * naming the defect. */
  private def validateKeyed(spark: SparkSession, dir: String,
      valCol: String,
      inRange: org.apache.spark.sql.Column => org.apache.spark.sql.Column,
      rangeDesc: String): Long = {
    val df = spark.read.parquet(dir)
    val agg = df.agg(count(lit(1)).as("n"),
      countDistinct(col("source")).as("nd"),
      sum(when(col("source").isNull || col(valCol).isNull, 1L)
        .otherwise(0L)).as("nulls"),
      sum(when(col(valCol).isNotNull && !inRange(col(valCol)), 1L)
        .otherwise(0L)).as("bad")).head()
    require(agg.getLong(0) > 0, "empty mixture table — nothing committed")
    require(agg.getLong(2) == 0,
      s"null source or $valCol rows — nothing committed")
    require(agg.getLong(1) == agg.getLong(0),
      s"duplicate source rows (${agg.getLong(0)} rows, ${agg.getLong(1)} " +
        "distinct sources) — a mixture is unique on source; nothing committed")
    require(agg.getLong(3) == 0L,
      s"${agg.getLong(3)} $valCol value(s) not $rangeDesc — nothing committed")
    agg.getLong(0)
  }
}
