package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** EXACT distributed percentile selection with bounded memory — the
  * scale-safe implementation of `percentile_disc` (B11).
  *
  * Spark's `percentile_disc` buffers every group's values inside the
  * aggregation buffer: with a handful of groups, each buffer holds a
  * group's whole slice of the fact table — an executor OOM at 100×, not
  * a slowdown. This operator keeps the RankOps count-arithmetic
  * discipline instead: selection by COUNTING, never by materializing a
  * group's values in one place.
  *
  * percentile_disc(p) = the smallest value whose cumulative count
  * reaches rank k, where k is the smallest integer with k/n ≥ p (the
  * same double-math comparison Spark's cume_dist selection makes, so
  * results are bit-identical — spec-asserted against the built-in).
  * The k-th value is found by iterative range narrowing:
  *
  *   1. one pass bands each group's value range into `bands` buckets and
  *      counts per (group, band) — a map-side-combinable aggregation
  *      whose output (≤ states × bands rows) is collected driver-side,
  *      the same role AQE gives per-stage statistics;
  *   2. the band containing rank k becomes the new [lo, hi] (its exact
  *      observed min/max ride the same aggregate, so ranges tighten to
  *      real values, not arithmetic midpoints), k is rebased, and the
  *      pass repeats over rows in the shrunken range — a pushed-down
  *      range filter, touching ever less data;
  *   3. once a state's range holds ≤ `directCap` rows the k-th distinct
  *      value is read off a (value, count) aggregate of just that range.
  *
  * Every (group, quantile) state advances through the SAME jobs — 15
  * states is 15 rows in a broadcast spec table, not 15 scans. Each
  * band pass cuts the candidate count by ~`bands`×, so even a 100 TB
  * group resolves in 3-4 passes; per-pass executor state is one count
  * per (state, band) — independent of group size.
  */
object PercentileOps {

  /** Exact percentile_disc values for every (group, p). NULL values are
    * ignored, matching the built-in; groups with no non-null values are
    * absent from the result. NaN sorts LAST (largest), as in Spark's
    * ordering: a rank that lands past the non-NaN values returns NaN.
    * The band arithmetic itself only ever sees non-NaN values — NaN
    * fails every range comparison, so letting it into `base` would
    * strand it outside all bands and desync the counts. */
  def percentileDisc(df: DataFrame, groupCol: String, valueCol: String,
      ps: Seq[Double], bands: Int = 1024, directCap: Long = 65536,
      maxIter: Int = 8, maxGroups: Int = 4096): Map[(String, Double), Double] =
    percentileDiscWithCounts(df, groupCol, valueCol, ps, bands, directCap,
      maxIter, maxGroups)._1

  /** [[percentileDisc]] plus each group's non-null value count — the
    * count already rides the selector's first statistics pass, so a
    * caller that needs both (RobustStats' (n, median, mad) frame)
    * saves one full scan-aggregate job by reading it from here
    * instead of re-counting (guide §2.4: don't recompute what an
    * existing pass already produced).
    *
    * directCap default 65536 (r19, raised from 16384): the cap bounds
    * the DRIVER transfer of the terminal pass — at most directCap
    * (value, count) pairs per unresolved state, ~1.5 MiB at 64Ki —
    * and every group under it skips a whole banded scan pass. The
    * former 16 Ki cap forced an extra full-input pass on groups of
    * 17k-64k rows to save a megabyte of driver traffic — the wrong
    * trade at any scale (driver budget documented here, not tuned to
    * the local testdata: the worst case is maxGroups·directCap pairs
    * only if every group is simultaneously near the cap, the same
    * envelope the old default had). */
  def percentileDiscWithCounts(df: DataFrame, groupCol: String,
      valueCol: String, ps: Seq[Double], bands: Int = 1024,
      directCap: Long = 65536, maxIter: Int = 8, maxGroups: Int = 4096)
      : (Map[(String, Double), Double], Map[String, Long]) = {
    val spark = df.sparkSession
    import spark.implicits._
    val valued = df.filter(col(valueCol).isNotNull)
      .select(col(groupCol).cast("string").as("_g"),
        col(valueCol).cast("double").as("_v"))
    val base = valued.filter(!isnan(col("_v")))

    final case class State(sid: Int, group: String, p: Double,
      var lo: Double, var hi: Double, var k: Long, var cnt: Long)

    // n counts NaN (it participates in the rank denominator, sorted
    // last); mn/mx/nn cover the non-NaN values the band passes scan.
    // Driver state is one row per group (and later groups × ps × bands
    // counts per pass) — that is the operator's contract, so the group
    // cardinality is CAPPED: the limit(maxGroups + 1) bounds what this
    // collect can ever pull even when the cap is violated, and the
    // require turns a silent driver OOM into a named error.
    val stats = valued.groupBy(col("_g"))
      .agg(count(lit(1)).as("n"),
        count(when(!isnan(col("_v")), lit(1))).as("nn"),
        min(when(!isnan(col("_v")), col("_v"))).as("mn"),
        max(when(!isnan(col("_v")), col("_v"))).as("mx"))
      .limit(maxGroups + 1)
      .collect()
    require(stats.length <= maxGroups,
      s"percentileDisc: more than maxGroups=$maxGroups distinct values in " +
        s"'$groupCol' — per-group driver state would be unbounded; use the " +
        "approx sketch path or raise maxGroups deliberately")
    var sid = -1
    val resolved = scala.collection.mutable.Map.empty[(String, Double), Double]
    val states = (for (r <- stats; p <- ps) yield {
      val n = r.getLong(1)
      val nn = r.getLong(2)
      // smallest k with k/n >= p, in the same double math as cume_dist
      var k = math.max(1L, math.min(n, math.ceil(p * n).toLong))
      while (k > 1 && (k - 1).toDouble / n >= p) k -= 1
      while (k.toDouble / n < p && k < n) k += 1
      if (k > nn) {
        // rank falls in the NaN tail
        resolved((r.getString(0), p)) = Double.NaN
        None
      } else {
        sid += 1
        Some(State(sid, r.getString(0), p, r.getDouble(3), r.getDouble(4), k, nn))
      }
    }).flatten.toBuffer
    def resolve(s: State, v: Double): Unit = {
      resolved((s.group, s.p)) = v
      states -= s
    }
    states.toArray.foreach(s => if (s.lo == s.hi) resolve(s, s.lo))

    var iter = 0
    while (states.nonEmpty) {
      val (direct, banded) = states.toArray.partition(s =>
        s.cnt <= directCap || iter >= maxIter)
      // the maxIter escape hatch must not silently collect an unbounded
      // residual: a state that exhausted its passes while still above
      // directCap (a pathologically band-resistant distribution) fails
      // loudly instead of pulling its range to the driver
      for (s <- direct if s.cnt > directCap)
        throw new IllegalStateException(
          s"percentileDisc: group '${s.group}' p=${s.p} did not converge " +
            s"below directCap=$directCap within maxIter=$maxIter band passes " +
            s"(residual ${s.cnt} rows) — raise bands/maxIter or directCap")
      // the union of the active ranges as a LITERAL envelope: per-state
      // bounds live in the broadcast spec join (columns can't push), but
      // this literal conjunct reaches the parquet scan's row-group stats
      // — after the first pass the envelope is narrow, so later passes
      // skip most of the file instead of re-decoding it
      def envelope(ss: Array[State]) =
        col("_v") >= lit(ss.map(_.lo).min) && col("_v") <= lit(ss.map(_.hi).max)
      if (direct.nonEmpty) {
        // terminal selection: (value, count) of each state's residual
        // range — ≤ directCap rows per state by construction
        val specs = broadcast(direct.toSeq
          .map(s => (s.sid, s.group, s.lo, s.hi))
          .toDF("_sid", "_sg", "_slo", "_shi"))
        val got = base.filter(envelope(direct)).join(specs, col("_g") === col("_sg") &&
            col("_v") >= col("_slo") && col("_v") <= col("_shi"))
          .groupBy(col("_sid"), col("_v")).agg(count(lit(1)).as("_c"))
          .collect()
          .groupBy(_.getInt(0))
        for (s <- direct) {
          val vals = got(s.sid).map(r => (r.getDouble(1), r.getLong(2))).sortBy(_._1)
          var k = s.k
          var i = 0
          while (k > vals(i)._2) { k -= vals(i)._2; i += 1 }
          resolve(s, vals(i)._1)
        }
      }
      if (banded.nonEmpty) {
        val specs = broadcast(banded.toSeq
          .map(s => (s.sid, s.group, s.lo, s.hi, (s.hi - s.lo) / bands))
          .toDF("_sid", "_sg", "_slo", "_shi", "_sw"))
        val band = least(floor((col("_v") - col("_slo")) / col("_sw")), lit(bands - 1))
          .cast("int")
        val got = base.filter(envelope(banded)).join(specs, col("_g") === col("_sg") &&
            col("_v") >= col("_slo") && col("_v") <= col("_shi"))
          .groupBy(col("_sid"), band.as("_b"))
          .agg(count(lit(1)).as("_c"), min(col("_v")).as("_bmn"), max(col("_v")).as("_bmx"))
          .collect()
          .groupBy(_.getInt(0))
        for (s <- banded) {
          val bs = got(s.sid).map(r =>
            (r.getInt(1), r.getLong(2), r.getDouble(3), r.getDouble(4))).sortBy(_._1)
          var k = s.k
          var i = 0
          while (k > bs(i)._2) { k -= bs(i)._2; i += 1 }
          val (_, c, bmn, bmx) = bs(i)
          if (bmn == bmx) resolve(s, bmn)
          else { s.lo = bmn; s.hi = bmx; s.k = k; s.cnt = c }
        }
      }
      iter += 1
    }
    (resolved.toMap, stats.map(r => r.getString(0) -> r.getLong(1)).toMap)
  }

  /** A31 (gated `feat_quantile_bin`): exact quantile BINNING — the
    * classic feature-store bucketize transform (quartile tiers of
    * customer spend here; the A8/A9 scaling family's ordinal sibling).
    * Cuts come from [[percentileDisc]] (bounded memory at any table
    * size — the whole point of using the B11 machinery rather than
    * buffering the spend distribution), values are exact integer
    * cents, and the bucket rule is "first cut ≥ value, ties LOW":
    * percentile cuts are actual data values, so the ≤ comparisons are
    * integer-exact cross-engine (DuckDB's quantile_disc convention
    * matches percentileDisc — probed for E30's perp_buckets). NOT
    * ntile: ntile splits ties across buckets by row order, which no
    * cross-engine gate can pin. */
  def featQuantileBin(spark: org.apache.spark.sql.SparkSession,
      d: String): DataFrame = {
    // anchored (r19): the spend rollup feeds the quantile selector's
    // statistics pass, its terminal pass, the final projection AND the
    // output sort's range sampling — un-anchored, the orders scan and
    // customer aggregation re-ran for each (4 computations of the same
    // frame). One materialization of a customers-sized rollup instead
    // (guide §2.4); results are bit-identical.
    val spend = graft.Tables.orders(spark, d)
      .groupBy(col("o_custkey"))
      .agg(sum(graft.functions.Exact.cents(col("o_totalprice")))
        .as("spend_cents"))
      .localCheckpoint()
    val cuts = percentileDisc(
      spend.withColumn("_one", lit("all")), "_one", "spend_cents",
      Seq(0.25, 0.5, 0.75))
    val (q1, q2, q3) =
      (cuts(("all", 0.25)), cuts(("all", 0.5)), cuts(("all", 0.75)))
    spend.select(col("o_custkey"), col("spend_cents"),
        when(col("spend_cents") <= q1, 1)
          .when(col("spend_cents") <= q2, 2)
          .when(col("spend_cents") <= q3, 3)
          .otherwise(4).as("bucket"))
      .orderBy("o_custkey")
  }

  val featQuantileBinSql: String =
    """WITH s AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT)
      |      AS spend_cents
      |  FROM orders GROUP BY o_custkey),
      |c AS (
      |  SELECT quantile_disc(spend_cents, 0.25) AS q1,
      |    quantile_disc(spend_cents, 0.5) AS q2,
      |    quantile_disc(spend_cents, 0.75) AS q3
      |  FROM s)
      |SELECT s.o_custkey, s.spend_cents,
      |  CASE WHEN s.spend_cents <= c.q1 THEN 1
      |       WHEN s.spend_cents <= c.q2 THEN 2
      |       WHEN s.spend_cents <= c.q3 THEN 3
      |       ELSE 4 END AS bucket
      |FROM s, c ORDER BY s.o_custkey""".stripMargin

  val queries: Map[String, (org.apache.spark.sql.SparkSession, String) => DataFrame] =
    Map("feat_quantile_bin" -> featQuantileBin _)

  val oracles: Map[String, String] =
    Map("feat_quantile_bin" -> featQuantileBinSql)
}
