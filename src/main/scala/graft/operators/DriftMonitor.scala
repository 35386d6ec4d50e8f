package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G22: feature drift monitoring — distribution comparison between two
  * populations of the SAME feature (training snapshot vs serving
  * window, version N vs version N+1, last week vs this week). A
  * feature store that serves vectors but cannot say "the distribution
  * your model was trained on is no longer the distribution you are
  * serving" is blind to the main way feature pipelines fail in
  * production; PSI (population stability index — the credit-scoring
  * industry's standard drift score) and KL divergence over binned
  * distributions are the published, threshold-able answer
  * (conventional PSI reading: < 0.1 stable, 0.1-0.25 moderate shift,
  * > 0.25 action).
  *
  * Everything is exact-counting first, scores second:
  *
  *   - [[histogram]] bins by a LITERAL edge array — bin = number of
  *     edges ≤ v (0 = below the first edge, |edges| = at or above the
  *     last, -1 = NULL: null rates are a drift signal, counted like
  *     any bin, never dropped). Explicit edges make runs comparable
  *     across days/engines — the property monitoring needs most;
  *     [[equiWidthEdges]] derives them from the REFERENCE side once,
  *     to be frozen and reused.
  *   - [[numericDrift]] / [[categoricalDrift]] produce the per-bin /
  *     per-category comparison frame (ref_n, cur_n, zero-filled via
  *     full-outer alignment; categories additionally labeled
  *     novel / vanished / common — schema drift in data form).
  *   - [[driftSummary]] folds either frame to one row: PSI, KL(ref‖cur),
  *     total-variation distance, and a chi-square score, under a PINNED
  *     smoothing rule (add-λ, λ = 0.5, denominator N + λ·K with K = the
  *     number of rows in the comparison frame — both-zero bins never
  *     appear, so K is well-defined from the frame alone). Smoothing is
  *     what makes PSI/KL finite when a bin empties on one side — the
  *     exact situation drift monitoring exists to catch; identical
  *     inputs score exactly 0.0 (p = q term-by-term, no float residue).
  *
  * Scale shape: each side pays ONE scan into a map-side-combinable
  * groupBy on a bounded key (bins/categories); everything after is
  * arithmetic on a bins-sized frame (the full-outer join and the
  * 1-row summary aggregate are driver-trivial by construction —
  * |edges|+2 rows, never corpus-sized; categorical cardinality is the
  * caller's contract, same as any groupBy-on-category analytics).
  * Zero corpus joins, zero windows, stream-friendly (the per-side
  * histogram is the same one-pass shape the streaming gates use).
  *
  * [[featureDrift]] binds the family to the store: compare two
  * MATERIALIZED VERSIONS of a registered feature (numeric features on
  * `value`, anything else on `value_str`) — the reference's versioned
  * materialization (models.py:45-62) is exactly what makes
  * version-over-version drift a first-class question.
  */
object DriftMonitor {

  /** Bin id under a literal edge array: count of edges ≤ v. 0 = below
    * all edges, edges.size = at/above the last, -1 = NULL. */
  def binCol(v: Column, edges: Seq[Double]): Column =
    when(v.isNull, lit(-1)).otherwise(
      size(filter(typedLit(edges), e => e <= v)))

  private def requireEdges(edges: Seq[Double]): Unit = {
    require(edges.nonEmpty, "edges must be non-empty")
    require(edges.zip(edges.tail).forall { case (a, b) => a < b },
      s"edges must be strictly increasing: $edges")
  }

  /** Exact bin counts: (bin, n). One scan, map-side combinable. */
  def histogram(df: DataFrame, valueCol: String,
      edges: Seq[Double]): DataFrame = {
    requireEdges(edges)
    df.select(binCol(col(valueCol), edges).as("bin"))
      .groupBy("bin").agg(count(lit(1)).as("n"))
  }

  /** Equi-width edges from the reference side: nBins bins over
    * [min, max) plus the implicit under/overflow bins ([[binCol]]'s 0
    * and |edges|). One aggregate; freeze the result and reuse it for
    * every later comparison — re-deriving edges per run would make
    * PSI incomparable across days. A constant column (min = max)
    * degenerates to the single edge {min}: everything lands in bin 1
    * until the distribution actually moves. */
  def equiWidthEdges(ref: DataFrame, valueCol: String,
      nBins: Int = 10): Seq[Double] = {
    require(nBins > 0, s"nBins $nBins must be positive")
    val r = ref.agg(min(col(valueCol)).cast("double"),
      max(col(valueCol)).cast("double")).head()
    require(!r.isNullAt(0), s"no non-null values in '$valueCol'")
    val (lo, hi) = (r.getDouble(0), r.getDouble(1))
    if (lo == hi) Seq(lo)
    else (0 to nBins).map(i => lo + i * (hi - lo) / nBins)
  }

  /** Per-bin comparison of two populations under shared literal edges:
    * (bin, lo, hi, ref_n, cur_n) — lo/hi are the bin's bounds (NULL on
    * the open under/overflow ends and on the null bin), counts
    * zero-filled on the side a bin is absent from. */
  def numericDrift(ref: DataFrame, cur: DataFrame, valueCol: String,
      edges: Seq[Double]): DataFrame = {
    requireEdges(edges)
    val rh = histogram(ref, valueCol, edges).withColumnRenamed("n", "ref_n")
    val ch = histogram(cur, valueCol, edges).withColumnRenamed("n", "cur_n")
    val e = typedLit(edges)
    rh.join(ch, Seq("bin"), "full_outer")
      .na.fill(0L, Seq("ref_n", "cur_n"))
      .withColumn("lo", when(col("bin").between(1, edges.size),
        element_at(e, col("bin").cast("int"))))
      .withColumn("hi", when(col("bin").between(0, edges.size - 1),
        element_at(e, (col("bin") + 1).cast("int"))))
      .select(col("bin"), col("lo"), col("hi"), col("ref_n"), col("cur_n"))
  }

  /** Exact category counts: (category, n) — the categorical sibling of
    * [[histogram]] and the frozen-reference form the streaming monitor
    * compares windows against. NULL categories count under a NULL key. */
  def categoricalHistogram(df: DataFrame, catCol: String): DataFrame =
    df.select(col(catCol).cast("string").as("category"))
      .groupBy("category").agg(count(lit(1)).as("n"))

  /** Per-category comparison: (category, ref_n, cur_n, status) with
    * status ∈ novel (unseen in ref) / vanished (gone from cur) /
    * common. NULL categories count as a real category (null-safe
    * alignment), surfaced as a NULL key — dropping them would hide a
    * null-rate shift. */
  def categoricalDrift(ref: DataFrame, cur: DataFrame,
      catCol: String): DataFrame = {
    def h(df: DataFrame, n: String) =
      categoricalHistogram(df, catCol).withColumnRenamed("n", n)
    val rh = h(ref, "ref_n").as("r")
    val ch = h(cur, "cur_n").as("c")
    rh.join(ch, col("r.category") <=> col("c.category"), "full_outer")
      .select(
        coalesce(col("r.category"), col("c.category")).as("category"),
        coalesce(col("ref_n"), lit(0L)).as("ref_n"),
        coalesce(col("cur_n"), lit(0L)).as("cur_n"))
      .withColumn("status",
        when(col("ref_n") === 0, "novel")
          .when(col("cur_n") === 0, "vanished")
          .otherwise("common"))
  }

  /** One-row drift scores over any (ref_n, cur_n) comparison frame —
    * [[numericDrift]] or [[categoricalDrift]] output alike:
    *
    *   n_ref / n_cur / n_bins   exact totals and frame row count K
    *   psi   Σ (p−q)·ln(p/q)      p = (ref_n+λ)/(n_ref+λK), q likewise
    *   kl    Σ p·ln(p/q)          (KL(ref ‖ cur), same smoothing)
    *   tvd   ½ Σ |ref_n/n_ref − cur_n/n_cur|   (raw fractions)
    *   chi2  Σ (cur_n − eᵢ)² / eᵢ with eᵢ = p·n_cur  (a drift score —
    *         smoothing guards empty expected cells, so this is the
    *         Pearson SHAPE, not an exact test statistic)
    *
    * λ = 0.5 (pinned). An empty side yields NULL scores (fail-visible)
    * rather than a fabricated 0.
    *
    * `by` groups the fold: pass key columns (e.g. the window bounds of
    * a streaming comparison) to get ONE summary row PER KEY, each key's
    * totals and K computed over its own rows — the batch comparator
    * [[graft.streaming.StreamingDriftMonitor]] reuses, so batch and
    * online scores share one definition. */
  def driftSummary(comparison: DataFrame,
      by: Seq[String] = Nil): DataFrame = {
    val lam = 0.5
    val totAgg = Seq(
      sum("ref_n").as("n_ref"), sum("cur_n").as("n_cur"),
      count(lit(1)).as("n_bins"))
    val tot =
      if (by.isEmpty) comparison.agg(totAgg.head, totAgg.tail: _*)
      else comparison.groupBy(by.map(col): _*)
        .agg(totAgg.head, totAgg.tail: _*)
    // ANSI-safe: an empty side makes these terms NULL (and the final
    // mask nulls the scores anyway) instead of tripping DIVIDE_BY_ZERO
    def over(n: Column, d: Column): Column = when(d > 0, n / d)
    val p = (col("ref_n") + lam) / (col("n_ref") + col("n_bins") * lam)
    val q = (col("cur_n") + lam) / (col("n_cur") + col("n_bins") * lam)
    val joined =
      if (by.isEmpty) comparison.join(broadcast(tot))
      else comparison.join(broadcast(tot), by)
    val keyCols = by.map(col)
    joined
      .select(keyCols ++ Seq(col("n_ref"), col("n_cur"), col("n_bins"),
        ((p - q) * log(p / q)).as("_psi"),
        (p * log(p / q)).as("_kl"),
        abs(over(col("ref_n"), col("n_ref")) -
          over(col("cur_n"), col("n_cur"))).as("_tv"),
        over(pow(col("cur_n") - p * col("n_cur"), 2),
          p * col("n_cur")).as("_x2")): _*)
      .groupBy(keyCols ++ Seq(col("n_ref"), col("n_cur"), col("n_bins")): _*)
      .agg(sum("_psi").as("psi"), sum("_kl").as("kl"),
        (sum("_tv") / 2).as("tvd"), sum("_x2").as("chi2"))
      .withColumn("psi", when(col("n_ref") > 0 && col("n_cur") > 0, col("psi")))
      .withColumn("kl", when(col("n_ref") > 0 && col("n_cur") > 0, col("kl")))
      .withColumn("tvd", when(col("n_ref") > 0 && col("n_cur") > 0, col("tvd")))
      .withColumn("chi2", when(col("n_ref") > 0 && col("n_cur") > 0, col("chi2")))
  }

  /** Two-sample Kolmogorov-Smirnov distance over an ORDERED binned
    * comparison ([[numericDrift]] output): the maximum, taken in bin
    * order, of |cumulative ref fraction − cumulative cur fraction| —
    * the classic supremum-of-CDF-gap statistic, at bin resolution
    * (binning can only UNDERSTATE the continuous KS, never overstate
    * it — both CDFs are evaluated at the same edge set). Complements
    * the summary scores: PSI/KL weight per-bin ratios, KS catches a
    * consistent small shift that accumulates across bins.
    *
    * The NULL bin is EXCLUDED (a CDF over nulls is undefined; null
    * mass stays visible in the comparison rows and the G22 null-bin
    * convention). Computed driver-side over the bins-sized frame (the
    * percentileDisc collect class — bounded by |edges|+2 rows, never
    * data-sized). None when either side has no non-null rows. */
  def ksStatistic(comparison: DataFrame): Option[Double] = {
    val rows = comparison.select("bin", "ref_n", "cur_n")
      .collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
      .filter(_._1 >= 0)
      .sortBy(_._1)
    val nr = rows.map(_._2).sum.toDouble
    val nc = rows.map(_._3).sum.toDouble
    if (nr == 0 || nc == 0) None
    else {
      var cr, cc = 0L
      var ks = 0.0
      rows.foreach { case (_, a, b) =>
        cr += a; cc += b
        ks = math.max(ks, math.abs(cr / nr - cc / nc))
      }
      Some(ks)
    }
  }

  /** Version-over-version drift for a REGISTERED feature: compare two
    * materialized versions out of the value store (partition-pruned
    * reads). Numeric features bin `value` (explicit edges, or
    * [[equiWidthEdges]] frozen off the reference version); every other
    * featureType compares `value_str` categorically. */
  def featureDrift(fs: graft.registry.FeatureStore, feature: String,
      refVersion: String, curVersion: String, nBins: Int = 10,
      edges: Option[Seq[Double]] = None): Either[List[String], DataFrame] = {
    val fd = fs.listFeatures.find(_.name == feature)
      .toRight(List(s"Feature '$feature' not found")) match {
        case Left(e) => return Left(e)
        case Right(d) => d
      }
    for {
      ref <- fs.versionValues(feature, refVersion)
      cur <- fs.versionValues(feature, curVersion)
    } yield
      if (fd.featureType == "numeric")
        numericDrift(ref, cur, "value",
          edges.getOrElse(equiWidthEdges(ref, "value", nBins)))
      else categoricalDrift(ref, cur, "value_str")
  }

  // ---- gated harness entries ----------------------------------------------

  private val histEdges: Seq[Double] =
    (0 to 10).map(_ * 50.0) // integer-valued: bin boundaries exact in doubles

  /** Gated entry (`drift_hist`): the numeric binning + alignment tier
    * against ground truth — exact integer bin counts of two event
    * populations (view = reference, purchase = current) under literal
    * integer-valued edges, so every ≤ comparison is exact in both
    * engines (the bm25_postings precedent: gate the integer tier; the
    * ln-based scores are float territory, spec-pinned instead).
    * DuckDB re-derives the bin rule with list_filter and aligns the
    * sides with FILTER counts. */
  def driftHist(spark: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(spark, d)
    numericDrift(
      ev.filter(col("event_type") === "view"),
      ev.filter(col("event_type") === "purchase"),
      "value", histEdges)
      .withColumn("bin", col("bin").cast("long")) // driver hash is dtype-exact
  }

  val driftHistSql: String = {
    val list = histEdges.map(e => f"$e%.1f").mkString("[", ", ", "]")
    s"""WITH binned AS (
       |  SELECT len(list_filter($list, e -> e <= value)) AS bin, event_type
       |  FROM events WHERE event_type IN ('view', 'purchase')),
       |agg AS (
       |  SELECT bin,
       |    count(*) FILTER (WHERE event_type = 'view') AS ref_n,
       |    count(*) FILTER (WHERE event_type = 'purchase') AS cur_n
       |  FROM binned GROUP BY bin)
       |SELECT bin,
       |  CAST(CASE WHEN bin BETWEEN 1 AND ${histEdges.size}
       |    THEN $list[bin] END AS DOUBLE) AS lo,
       |  CAST(CASE WHEN bin BETWEEN 0 AND ${histEdges.size - 1}
       |    THEN $list[bin + 1] END AS DOUBLE) AS hi,
       |  ref_n, cur_n
       |FROM agg""".stripMargin
  }

  /** Gated entry (`drift_cat`): the categorical alignment + status
    * rule against ground truth — two overlapping-but-different event
    * populations (ref excludes 'error', cur excludes 'view') force all
    * three statuses: 'error' is novel, 'view' vanished, the rest
    * common. Pure integer/string output; DuckDB re-derives via two
    * grouped counts and a full outer join. */
  def driftCat(spark: SparkSession, d: String): DataFrame = {
    val ev = graft.Tables.events(spark, d)
    categoricalDrift(
      ev.filter(col("event_type") =!= "error"),
      ev.filter(col("event_type") =!= "view"),
      "event_type")
  }

  val driftCatSql: String =
    """WITH r AS (SELECT event_type AS category, count(*) AS n
      |  FROM events WHERE event_type <> 'error' GROUP BY 1),
      |c AS (SELECT event_type AS category, count(*) AS n
      |  FROM events WHERE event_type <> 'view' GROUP BY 1)
      |SELECT coalesce(r.category, c.category) AS category,
      |  coalesce(r.n, 0) AS ref_n, coalesce(c.n, 0) AS cur_n,
      |  CASE WHEN coalesce(r.n, 0) = 0 THEN 'novel'
      |       WHEN coalesce(c.n, 0) = 0 THEN 'vanished'
      |       ELSE 'common' END AS status
      |FROM r FULL OUTER JOIN c ON r.category = c.category""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "drift_hist" -> driftHist _,
    "drift_cat" -> driftCat _)

  val oracles: Map[String, String] = Map(
    "drift_hist" -> driftHistSql,
    "drift_cat" -> driftCatSql)
}
