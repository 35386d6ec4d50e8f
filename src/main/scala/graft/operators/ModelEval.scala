package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B38: model-evaluation verbs — the measurement tier for every scorer
  * this engine trains or applies (E24 quality classifier, G31 learned
  * match weights, E36 langid, A32 encodings): exact ROC AUC and the
  * thresholded confusion/PR readout.
  *
  * AUC is computed EXACTLY by the rank-sum (Mann–Whitney) identity on
  * the DISTINCT-SCORE frame: group scores once (ties collapse to
  * (score, n_pos, n_neg) counts), prefix-sum the negatives in score
  * order via RankOps.exclusivePrefixSum (the two-phase shape — never a
  * single-partition global window, plan-audited), then
  * AUC = (Σ p_s·negBefore_s + ½·Σ p_s·n_s) / (n_pos·n_neg):
  * pairs won plus half the ties. All counts are exact longs under the
  * B30 2⁵³ guard; the ½ scaling and final division are single IEEE
  * ops — bit-identical cross-engine (gated). Degenerate inputs pin
  * NULL (no positives or no negatives — AUC undefined).
  *
  * NULL score or label rows are EXCLUDED and counted (`n_skipped`) —
  * an unscored row is not evidence for either ranking order; silently
  * dropping it without the count would misstate coverage.
  *
  * Scale: one corpus aggregation to the distinct-score frame; the
  * prefix machinery touches only that frame (scores ≪ rows for any
  * real scorer; equal to rows only for an injective score, where the
  * frame is the corpus's key space — still one keyed shuffle).
  */
object ModelEval {

  private val Dec = "decimal(38,0)"
  private val MaxExact = math.pow(2, 53)

  private def safeDouble(c: Column, what: String): Column =
    when(abs(c) >= lit(MaxExact).cast(Dec),
      raise_error(concat(lit(s"ModelEval: |$what| >= 2^53, "
        + "decimal->double cast would round engine-dependently: "),
        c.cast("string"))))
      .otherwise(c.cast("double"))

  /** Exact ROC AUC. Output (1 row): (n_pos, n_neg, n_skipped, auc). */
  def auc(df: DataFrame, scoreCol: String, labelCol: String,
          numPartitions: Int = 32): DataFrame = {
    // ONE corpus aggregation covers both the score histogram and the
    // skipped count (checkpointed — two consumers would otherwise
    // re-scan the corpus); scores-sized from here on
    val grouped = df.select(col(scoreCol).as("_s"), col(labelCol).as("_y"))
      .withColumn("_ok", col("_s").isNotNull && col("_y").isNotNull)
      .groupBy(col("_ok"), col("_s")).agg(
        count(when(col("_y"), lit(1))).as("p"),
        count(when(!col("_y"), lit(1))).as("n"),
        count(lit(1)).as("_c"))
      .localCheckpoint()
    val skipped = grouped.filter(!col("_ok"))
      .agg(coalesce(sum(col("_c")), lit(0L)).as("n_skipped"))
    val byScore = grouped.filter(col("_ok")).select(col("_s"), col("p"), col("n"))
    val pref = RankOps.exclusivePrefixSum(byScore, "n", "_negBefore",
      numPartitions, col("_s").asc)
    val sums = pref.agg(
      sum(col("p")).cast(Dec).as("_np"), sum(col("n")).cast(Dec).as("_nn"),
      sum(col("p").cast(Dec) * col("_negBefore").cast(Dec)).as("_won"),
      sum(col("p").cast(Dec) * col("n").cast(Dec)).as("_tied"))
    sums.crossJoin(broadcast(skipped))
      .select(col("_np").cast("long").as("n_pos"),
        col("_nn").cast("long").as("n_neg"), col("n_skipped"),
        when(col("_np") === 0 || col("_nn") === 0, lit(null).cast("double"))
          .otherwise(
            (safeDouble(col("_won"), "pairs_won") +
              lit(0.5) * safeDouble(col("_tied"), "pairs_tied")) /
            (safeDouble(col("_np"), "n_pos") * safeDouble(col("_nn"), "n_neg")))
          .as("auc"))
  }

  /** Thresholded confusion + derived metrics (1 row). Predicted
    * positive = score >= threshold (pinned). Zero-denominator metrics
    * pin NULL. */
  def confusion(df: DataFrame, scoreCol: String, labelCol: String,
                threshold: Double): DataFrame = {
    val clean = df.filter(col(scoreCol).isNotNull && col(labelCol).isNotNull)
    val pred = col(scoreCol) >= lit(threshold)
    val c = clean.agg(
      count(when(pred && col(labelCol), lit(1))).as("tp"),
      count(when(pred && !col(labelCol), lit(1))).as("fp"),
      count(when(!pred && !col(labelCol), lit(1))).as("tn"),
      count(when(!pred && col(labelCol), lit(1))).as("fn"))
    val precision = when(col("tp") + col("fp") === 0, lit(null).cast("double"))
      .otherwise(col("tp").cast("double") / (col("tp") + col("fp")).cast("double"))
    val recall = when(col("tp") + col("fn") === 0, lit(null).cast("double"))
      .otherwise(col("tp").cast("double") / (col("tp") + col("fn")).cast("double"))
    c.select(col("tp"), col("fp"), col("tn"), col("fn"),
      precision.as("precision"), recall.as("recall"),
      when(precision.isNull || recall.isNull || (precision + recall) === 0,
        lit(null).cast("double"))
        .otherwise(lit(2.0) * precision * recall / (precision + recall))
        .as("f1"),
      ((col("tp") + col("tn")).cast("double") /
        (col("tp") + col("fp") + col("tn") + col("fn")).cast("double"))
        .as("accuracy"))
  }

  /** Reliability (calibration) bins: scores bucket into `bins`
    * equal-width cells over [lo, hi) (clamped — out-of-range scores
    * land in the edge bins, never dropped silently), each cell
    * reporting population, positives, and the observed positive rate.
    * Bin assignment and edges are pinned IEEE chains (floor of one
    * multiply-divide), so the verdict is cross-engine exact. A scorer
    * is calibrated when pos_rate tracks the bin midpoint — the check
    * AUC cannot see (AUC is rank-only). NaN scores are excluded like
    * NULLs (a NaN would otherwise sail through the clamp — NaN
    * compares greater than everything in Spark — and silently skew
    * the TOP bin's pos_rate). */
  def calibration(df: DataFrame, scoreCol: String, labelCol: String,
                  bins: Int, lo: Double, hi: Double): DataFrame = {
    require(bins >= 2, s"bins=$bins")
    require(lo < hi, s"empty range [$lo, $hi)")
    val raw = floor((col(scoreCol) - lit(lo)) / lit(hi - lo) * lit(bins))
    val bin = least(greatest(raw, lit(0.0)), lit((bins - 1).toDouble))
      .cast("long")
    df.filter(col(scoreCol).isNotNull && !isnan(col(scoreCol).cast("double")) &&
        col(labelCol).isNotNull)
      .groupBy(bin.as("bin"))
      .agg(count(lit(1)).as("n"),
        count(when(col(labelCol), lit(1))).as("n_pos"))
      .select(col("bin"),
        (lit(lo) + col("bin").cast("double") * lit(hi - lo) / lit(bins.toDouble))
          .as("bin_lo"),
        col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("pos_rate"))
  }

  // ---------------------------------------------------------------- gates

  /** Gate `model_auc`: how well does quantity rank returned lineitems?
    * Integer scores exercise the tie machinery heavily (50 distinct
    * scores over the whole corpus — every rank is an average rank). */
  def aucGate(spark: SparkSession, d: String): DataFrame =
    auc(Tables.lineitem(spark, d).select(
        floor(col("l_quantity") + 0.5).cast("long").as("qty"),
        (col("l_returnflag") === "R").as("ret")),
      "qty", "ret")

  val aucSql: String =
    """WITH u AS (
      |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS s,
      |    (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |bys AS (
      |  SELECT s,
      |    CAST(COUNT(CASE WHEN y THEN 1 END) AS BIGINT) AS p,
      |    CAST(COUNT(CASE WHEN NOT y THEN 1 END) AS BIGINT) AS n
      |  FROM u GROUP BY s),
      |pref AS (
      |  SELECT s, p, n,
      |    CAST(COALESCE(SUM(n) OVER (ORDER BY s
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
      |      AS neg_before
      |  FROM bys),
      |sums AS (
      |  SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(n) AS BIGINT) AS nn,
      |    CAST(SUM(p * neg_before) AS BIGINT) AS won,
      |    CAST(SUM(p * n) AS BIGINT) AS tied
      |  FROM pref)
      |SELECT np AS n_pos, nn AS n_neg, CAST(0 AS BIGINT) AS n_skipped,
      |  CASE WHEN np = 0 OR nn = 0 THEN NULL
      |    ELSE (CAST(won AS DOUBLE) + 0.5 * CAST(tied AS DOUBLE))
      |      / (CAST(np AS DOUBLE) * CAST(nn AS DOUBLE)) END AS auc
      |FROM sums""".stripMargin

  /** Gate `model_confusion`: the thresholded readout at qty >= 25. */
  def confusionGate(spark: SparkSession, d: String): DataFrame =
    confusion(Tables.lineitem(spark, d).select(
        floor(col("l_quantity") + 0.5).cast("double").as("qty"),
        (col("l_returnflag") === "R").as("ret")),
      "qty", "ret", threshold = 25.0)

  val confusionSql: String =
    """WITH u AS (
      |  SELECT floor(l_quantity + 0.5) AS s, (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |c AS (
      |  SELECT
      |    CAST(COUNT(CASE WHEN s >= 25.0 AND y THEN 1 END) AS BIGINT) AS tp,
      |    CAST(COUNT(CASE WHEN s >= 25.0 AND NOT y THEN 1 END) AS BIGINT) AS fp,
      |    CAST(COUNT(CASE WHEN s < 25.0 AND NOT y THEN 1 END) AS BIGINT) AS tn,
      |    CAST(COUNT(CASE WHEN s < 25.0 AND y THEN 1 END) AS BIGINT) AS fn
      |  FROM u)
      |SELECT tp, fp, tn, fn,
      |  CASE WHEN tp + fp = 0 THEN NULL
      |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE) END AS precision,
      |  CASE WHEN tp + fn = 0 THEN NULL
      |    ELSE CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) END AS recall,
      |  CASE WHEN tp + fp = 0 OR tp + fn = 0
      |      OR CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE)
      |        + CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE) = 0 THEN NULL
      |    ELSE 2.0 * (CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
      |      * (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))
      |      / ((CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE))
      |        + (CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE))) END AS f1,
      |  CAST(tp + tn AS DOUBLE) / CAST(tp + fp + tn + fn AS DOUBLE) AS accuracy
      |FROM c""".stripMargin

  /** Gate `model_calibration`: 10 reliability bins of the qty score
    * over [0, 50) against the returned label. */
  def calibrationGate(spark: SparkSession, d: String): DataFrame =
    calibration(Tables.lineitem(spark, d).select(
        floor(col("l_quantity") + 0.5).cast("double").as("qty"),
        (col("l_returnflag") === "R").as("ret")),
      "qty", "ret", bins = 10, lo = 0.0, hi = 50.0)
      .orderBy(col("bin"))

  val calibrationSql: String =
    """WITH u AS (
      |  SELECT floor(l_quantity + 0.5) AS s, (l_returnflag = 'R') AS y
      |  FROM lineitem),
      |b AS (
      |  SELECT CAST(least(greatest(floor((s - 0.0) / 50.0 * 10), 0.0), 9.0)
      |    AS BIGINT) AS bin, y
      |  FROM u)
      |SELECT bin,
      |  0.0 + CAST(bin AS DOUBLE) * 50.0 / 10.0 AS bin_lo,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(CASE WHEN y THEN 1 END) AS BIGINT) AS n_pos,
      |  CAST(COUNT(CASE WHEN y THEN 1 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS pos_rate
      |FROM b GROUP BY bin
      |ORDER BY bin""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "model_auc" -> aucGate _,
    "model_confusion" -> confusionGate _,
    "model_calibration" -> calibrationGate _)

  val oracles: Map[String, String] = Map(
    "model_auc" -> aucSql,
    "model_confusion" -> confusionSql,
    "model_calibration" -> calibrationSql)
}
