package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Durable drift baselines — the missing storage half of G22's
  * freeze-the-edges rule: `equiWidthEdges` says "freeze the result and
  * reuse it for every later comparison" (re-derived edges make PSI
  * incomparable across days), and G32 froze the EMBEDDING reference as
  * a ModelStore artifact — this does the same for the scalar and
  * categorical families, so a monitoring deployment's baseline
  * survives the session that computed it.
  *
  * One artifact = the edges (numeric only) + the reference histogram,
  * on the ModelStore `_meta` convention (atomic meta swap LAST,
  * keep-two generations, lock-serialized writers). Edges ride the
  * meta as `Double.toString` values — exact round-trip by the Java
  * spec, so a reloaded baseline bins IDENTICALLY to the session that
  * froze it (the property the artifact exists for). Baselines are
  * bins-sized: KBs, never data-sized.
  */
object DriftBaseline {

  /** Freeze a numeric baseline: `edges` + the reference histogram
    * ([[DriftMonitor.histogram]] output over the reference
    * population). Validates the histogram's bin ids against the edge
    * count before the swap — a histogram binned under DIFFERENT edges
    * must not commit under these. */
  def saveNumeric(spark: SparkSession, path: String, edges: Seq[Double],
      refHist: DataFrame): Unit = {
    require(edges.nonEmpty && edges.zip(edges.tail).forall {
      case (a, b) => a < b }, s"edges must be strictly increasing: $edges")
    ModelStore.withLock(spark, path, "drift baseline") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "hist")
      refHist.select(col("bin").cast("int").as("bin"),
          col("n").cast("long").as("n"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val written = spark.read.parquet(dir)
      val bad = written.filter(col("bin") < -1 ||
        col("bin") > edges.size || col("n") < 0).count()
      require(bad == 0,
        s"$bad histogram rows are impossible under ${edges.size} edges " +
          "— was this histogram binned with different edges?")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "drift_baseline_numeric",
        "gen" -> g.toString,
        "edges" -> edges.map(_.toString).mkString(","),
        "nBins" -> written.count().toString))
      ModelStore.pruneGens(spark, path, g)
    }
  }

  /** Reopen a numeric baseline: (edges, reference histogram). The
    * edges are the ones to bin every LIVE population with — that is
    * the whole point of freezing them. */
  def loadNumeric(spark: SparkSession,
      path: String): (Seq[Double], DataFrame) = {
    val kv = ModelStore.readMeta(spark, path, "drift baseline")
    ModelStore.checkKind(kv, path, "drift_baseline_numeric", "1")
    val edges = kv("edges").split(',').toSeq.map(_.toDouble)
    (edges,
      spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "hist")))
  }

  /** Freeze a categorical baseline ((category, n) —
    * [[DriftMonitor.categoricalHistogram]] output). NULL categories
    * are a real row (the G22 null convention) and survive the
    * round-trip. */
  def saveCategorical(spark: SparkSession, path: String,
      refHist: DataFrame): Unit =
    ModelStore.withLock(spark, path, "drift baseline") {
      val g = ModelStore.nextGen(spark, path)
      val dir = ModelStore.genDir(path, g, "hist")
      refHist.select(col("category").cast("string").as("category"),
          col("n").cast("long").as("n"))
        .coalesce(1).write.mode("overwrite").parquet(dir)
      val written = spark.read.parquet(dir)
      require(written.filter(col("n") < 0).count() == 0,
        "negative reference counts")
      ModelStore.writeMeta(spark, path, Seq(
        "version" -> "1", "kind" -> "drift_baseline_categorical",
        "gen" -> g.toString, "nBins" -> written.count().toString))
      ModelStore.pruneGens(spark, path, g)
    }

  /** Reopen a categorical baseline. */
  def loadCategorical(spark: SparkSession, path: String): DataFrame = {
    val kv = ModelStore.readMeta(spark, path, "drift baseline")
    ModelStore.checkKind(kv, path, "drift_baseline_categorical", "1")
    spark.read.parquet(ModelStore.genDir(path, kv("gen").toLong, "hist"))
  }

  /** The deployment composition: score a live population against a
    * frozen numeric baseline — bin with the FROZEN edges, align, fold.
    * One scan of `cur`; everything else is bins-sized. */
  def scoreNumeric(spark: SparkSession, path: String, cur: DataFrame,
      valueCol: String): DataFrame = {
    val (edges, ref) = loadNumeric(spark, path)
    val curHist = DriftMonitor.histogram(cur, valueCol, edges)
    val cmp = ref.select(col("bin"), col("n").as("ref_n")).as("r")
      .join(curHist.select(col("bin"), col("n").as("cur_n")).as("c"),
        col("r.bin") <=> col("c.bin"), "full_outer")
      .select(coalesce(col("r.bin"), col("c.bin")).as("bin"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
    DriftMonitor.driftSummary(cmp)
  }
}
