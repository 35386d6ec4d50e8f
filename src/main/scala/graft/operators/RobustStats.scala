package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G25: robust per-group location/scale + outlier flagging — the
  * monitoring companion to G22 that answers "which ROWS are anomalous
  * right now" where drift answers "did the distribution move": the
  * modified z-score rule (Iglewicz & Hoaglin 1993's robust outlier
  * labeling) — flag v when |v − median| > k·MAD — using MEDIAN and MAD
  * (median absolute deviation) because mean/stddev are themselves
  * dragged by the outliers they are supposed to expose, while the
  * median/MAD pair has a 50% breakdown point.
  *
  * Exactness and scale ride the B11 machinery: both quantiles resolve
  * through [[PercentileOps.percentileDisc]] — exact percentile_disc
  * semantics by COUNTING (count-banded iterative range narrowing),
  * never a per-group value buffer, so a 100 TB group costs 3-4
  * passes of map-side-combinable aggregates and per-pass state of one
  * count per (group, band). Two quantile rounds (median, then median
  * of |v − median|), one broadcast join each — the stats frame is
  * groups-sized, never row-sized.
  *
  * Pinned conventions:
  *  - NULL values are ignored by the quantiles (the percentile_disc
  *    contract) and flag `is_outlier = NULL` (visible, not silently
  *    false — route null-rate questions to G22's null bin or A25's
  *    Expectations; a null has no distance from the median).
  *  - MAD = 0 (more than half the group identical) degenerates
  *    honestly: every v ≠ median flags. That is the strictest reading
  *    of the rule and the standard caveat of modified z-scores on
  *    low-cardinality data — documented, not patched, because any
  *    epsilon would be an unpinnable magic number.
  *  - groups are driver-bounded (percentileDisc's maxGroups guard
  *    fails loudly on a mistakenly high-cardinality group column).
  */
object RobustStats {

  /** Exact per-group (n, median, mad): a groups-sized frame.
    *
    * r19 shape: the group counts ride the median selector's own first
    * statistics pass ([[PercentileOps.percentileDiscWithCounts]]) and
    * the three per-group statistics are zipped DRIVER-side into one
    * local frame — the former standalone n aggregation (a full scan)
    * and the two distributed n⋈med⋈mad joins are gone (guide §2.4).
    * Same rows, same dtypes: n counts non-null values (NaN included),
    * exactly what the dropped filter+count computed. */
  def medianMad(df: DataFrame, groupCol: String,
      valueCol: String): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val (medMap, counts) = PercentileOps.percentileDiscWithCounts(
      df, groupCol, valueCol, Seq(0.5))
    val med = medMap.map { case ((g, _), v) => (g, v) }.toSeq
      .toDF("_g", "median")
    val dev = df
      .join(broadcast(med), df(groupCol).cast("string") === med("_g"))
      .withColumn("_absdev", abs(col(valueCol) - col("median")))
    val mad = PercentileOps.percentileDisc(dev, groupCol, "_absdev", Seq(0.5))
    medMap.toSeq.sortBy(_._1._1) // deterministic local-frame order
      .map { case ((g, _), m) => (g, counts(g), m, mad((g, 0.5))) }
      .toDF(groupCol, "n", "median", "mad")
  }

  /** Every input row + (n, median, mad, is_outlier): the modified z-score
    * gate |v − median| > k·MAD per group. k = 3 is the conventional
    * cut (≈3.5 in the original paper's scaled form; here k multiplies
    * raw MAD, so pick k to taste and freeze it). */
  def outliers(df: DataFrame, groupCol: String, valueCol: String,
      k: Double = 3.0): DataFrame = {
    require(k > 0, s"k $k must be positive")
    val stats = medianMad(df, groupCol, valueCol)
      .withColumnRenamed(groupCol, "_g")
    df.join(broadcast(stats), df(groupCol).cast("string") === stats("_g"),
        "left")
      .drop("_g")
      .withColumn("is_outlier",
        abs(col(valueCol) - col("median")) > col("mad") * k)
  }

  // ---- gated harness entry -------------------------------------------------

  /** Gated entry (`robust_outliers`): the whole chain against ground
    * truth — per-event-type median and MAD (percentile_disc semantics,
    * the B11 cross-engine convention) and the k=3 flag per event.
    * median/MAD are actual data values (exact), the |v−m| and 3·MAD
    * arithmetic is identical IEEE on identical doubles in both
    * engines, so the boolean is hash-exact. */
  def robustOutliers(spark: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(spark, d)
    outliers(ev, "event_type", "value", k = 3.0)
      .select(col("event_id"), col("event_type"), col("median"),
        col("mad"), col("is_outlier"))
  }

  val robustOutliersSql: String =
    """WITH med AS (
      |  SELECT event_type, quantile_disc(value, 0.5) AS median
      |  FROM events GROUP BY 1),
      |dev AS (
      |  SELECT e.event_id, e.event_type, e.value, med.median
      |  FROM events e JOIN med USING (event_type)),
      |mad AS (
      |  SELECT event_type, quantile_disc(abs(value - median), 0.5) AS mad
      |  FROM dev GROUP BY 1)
      |SELECT dev.event_id, dev.event_type, dev.median, mad.mad,
      |  abs(dev.value - dev.median) > 3.0 * mad.mad AS is_outlier
      |FROM dev JOIN mad USING (event_type)""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "robust_outliers" -> robustOutliers _)

  val oracles: Map[String, String] = Map(
    "robust_outliers" -> robustOutliersSql)
}
