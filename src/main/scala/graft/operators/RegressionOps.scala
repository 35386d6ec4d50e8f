package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B31/B32: per-group simple OLS regression and the pairwise Welch
  * t-test — the two inference verbs a feature-screening / experiment-
  * readout deployment runs right after B30's correlation screen, built
  * on the SAME exactness contract (CorrelationOps): sufficient
  * statistics accumulate as exact decimal(38,0) sums of caller-
  * discretized integer units (order-independent, engine-independent),
  * and every derived statistic is a SHORT PINNED CHAIN of single IEEE
  * double ops over operands that individually pass a 2⁵³ magnitude
  * guard — below 2⁵³ the decimal→double cast is exact in every engine,
  * so slope/t/df come out BIT-identical cross-engine (gated hash-exact,
  * like `corr_matrix`). Past the guard the operator REFUSES loudly
  * (never a silent engine-dependent rounding); the scale escape is the
  * un-gated double-sum `olsTrendFast`, whose ulps-level drift is
  * spec-bounded against the exact form.
  *
  * Shape: ONE map-side-combinable aggregation per group (p exact sums),
  * then arithmetic on the groups-sized frame — for the t-test, a
  * broadcast self-join of that frame against itself (groups², KBs at
  * any corpus size; the corpus is touched exactly once).
  */
object RegressionOps {

  private val Dec = "decimal(38,0)"
  private val MaxExact = math.pow(2, 53)

  /** Exact-cast guard: refuse rather than round past 2⁵³ (the
    * CorrelationOps contract). */
  private def safeDouble(c: Column, what: String): Column =
    when(abs(c) >= lit(MaxExact).cast(Dec),
      raise_error(concat(lit(s"RegressionOps: |$what| >= 2^53, "
        + "decimal->double cast would round engine-dependently; "
        + "use the *Fast path or smaller units: "), c.cast("string"))))
      .otherwise(c.cast("double"))

  /** Per-group simple OLS of integer-unit `yCol` on integer-unit
    * `xCol`: (group, n, slope, intercept, r2). Zero x-variance (or
    * n < 2) pins slope/intercept/r2 to NULL; zero y-variance under
    * nonzero x-variance pins slope/intercept normally and r2 to NULL
    * (the corr_matrix null convention). */
  def olsTrend(df: DataFrame, groupCol: String, xCol: String,
               yCol: String): DataFrame = {
    val (x, y) = (col(xCol).cast(Dec), col(yCol).cast(Dec))
    val s = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).cast(Dec).as("_n"),
      sum(x).as("_sx"), sum(y).as("_sy"),
      sum(x * x).as("_sxx"), sum(x * y).as("_sxy"), sum(y * y).as("_syy"))
    val n = col("_n")
    val num = n * col("_sxy") - col("_sx") * col("_sy")
    val dx = n * col("_sxx") - col("_sx") * col("_sx")
    val dy = n * col("_syy") - col("_sy") * col("_sy")
    val slope = safeDouble(num, "num") / safeDouble(dx, "dx")
    val intercept = (safeDouble(col("_sy"), "sy") -
      slope * safeDouble(col("_sx"), "sx")) / safeDouble(n, "n")
    val r = safeDouble(num, "num") /
      (sqrt(safeDouble(dx, "dx")) * sqrt(safeDouble(dy, "dy")))
    s.select(col("grp"), n.cast("long").as("n"),
      when(dx === 0, lit(null).cast("double")).otherwise(slope).as("slope"),
      when(dx === 0, lit(null).cast("double")).otherwise(intercept)
        .as("intercept"),
      when(dx === 0 || dy === 0, lit(null).cast("double"))
        .otherwise(r * r).as("r2"))
  }

  /** Scale path: plain double sums, no magnitude bound, not gated
    * (accumulation order costs the last ulps — the corrMatrixFast
    * trade). */
  def olsTrendFast(df: DataFrame, groupCol: String, xCol: String,
                   yCol: String): DataFrame = {
    val (x, y) = (col(xCol).cast("double"), col(yCol).cast("double"))
    val s = df.groupBy(col(groupCol).as("grp")).agg(
      count(lit(1)).cast("double").as("_n"),
      sum(x).as("_sx"), sum(y).as("_sy"),
      sum(x * x).as("_sxx"), sum(x * y).as("_sxy"), sum(y * y).as("_syy"))
    val n = col("_n")
    val num = n * col("_sxy") - col("_sx") * col("_sy")
    val dx = n * col("_sxx") - col("_sx") * col("_sx")
    val dy = n * col("_syy") - col("_sy") * col("_sy")
    val slope = num / dx
    s.select(col("grp"), n.cast("long").as("n"),
      when(dx === 0, lit(null).cast("double")).otherwise(slope).as("slope"),
      when(dx === 0, lit(null).cast("double"))
        .otherwise((col("_sy") - slope * col("_sx")) / n).as("intercept"),
      when(dx === 0 || dy === 0, lit(null).cast("double"))
        .otherwise((num / (sqrt(dx) * sqrt(dy)))
          * (num / (sqrt(dx) * sqrt(dy)))).as("r2"))
  }

  /** Pairwise Welch two-sample t-test over integer-unit `valueCol` by
    * `groupCol`: for every group pair a < b (string order), the mean
    * difference, the t statistic and the Welch–Satterthwaite degrees
    * of freedom. Groups with n < 2 are excluded (variance undefined);
    * a zero-variance PAIR (se² = 0) pins t and df to NULL. The corpus
    * is scanned ONCE: the groups-sized stats frame is localCheckpointed
    * (eager, executor-liveness contract as documented at SemDedup)
    * before the pairwise self-join — without the checkpoint each join
    * side would re-run the corpus aggregation. */
  def welchTTest(df: DataFrame, groupCol: String, valueCol: String): DataFrame = {
    val x = col(valueCol).cast(Dec)
    val s = df.groupBy(col(groupCol).cast("string").as("grp")).agg(
      count(lit(1)).cast(Dec).as("_n"),
      sum(x).as("_sx"), sum(x * x).as("_sxx"))
      .filter(col("_n") >= 2)
      .localCheckpoint()
    // exact operands: dvar = n·Σxx − Σx², denominators as exact decimals
    def side(tag: String) = s.select(
      col("grp").as(s"grp_$tag"),
      col("_n").cast("long").as(s"n_$tag"),
      (safeDouble(col("_sx"), "sx") / safeDouble(col("_n"), "n"))
        .as(s"m_$tag"),
      (safeDouble(col("_n") * col("_sxx") - col("_sx") * col("_sx"), "dvar")
        / safeDouble(col("_n") * (col("_n") - lit(1).cast(Dec)), "n(n-1)"))
        .as(s"v_$tag"),
      col("_n").cast("double").as(s"nd_$tag"))
    val joined = side("a").join(broadcast(side("b")),
      col("grp_a") < col("grp_b"))
    val sea = col("v_a") / col("nd_a")
    val seb = col("v_b") / col("nd_b")
    val se2 = sea + seb
    val t = (col("m_a") - col("m_b")) / sqrt(se2)
    val dfW = (se2 * se2) /
      (sea * sea / (col("nd_a") - lit(1.0)) +
        seb * seb / (col("nd_b") - lit(1.0)))
    joined.select(col("grp_a"), col("grp_b"), col("n_a"), col("n_b"),
      col("m_a").as("mean_a"), col("m_b").as("mean_b"),
      when(se2 === 0, lit(null).cast("double")).otherwise(t).as("t"),
      when(se2 === 0, lit(null).cast("double")).otherwise(dfW).as("df"))
  }

  // ---------------------------------------------------------------- gates

  /** Gate `ols_trend`: per-returnflag OLS of discount points on
    * quantity units — the corr_matrix unit convention, guard-clean at
    * every tested SF (operands are n²·var-sized over single-digit
    * units). */
  def olsTrendGate(spark: SparkSession, d: String): DataFrame =
    olsTrend(Tables.lineitem(spark, d).select(
        col("l_returnflag"),
        floor(col("l_quantity") + 0.5).cast("long").as("qty"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("disc_pct")),
      "l_returnflag", "qty", "disc_pct")
      .orderBy(col("grp"))

  val olsTrendSql: String =
    """WITH u AS (
      |  SELECT l_returnflag AS grp,
      |    CAST(floor(l_quantity + 0.5) AS BIGINT) AS x,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS y
      |  FROM lineitem),
      |s AS (
      |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(x*y) AS BIGINT) AS sxy,
      |    CAST(SUM(y*y) AS BIGINT) AS syy
      |  FROM u GROUP BY grp),
      |e AS (
      |  SELECT grp, n, n*sxy - sx*sy AS num, n*sxx - sx*sx AS dx,
      |    n*syy - sy*sy AS dy, sx, sy
      |  FROM s)
      |SELECT grp, n,
      |  CASE WHEN dx = 0 THEN NULL
      |    ELSE CAST(num AS DOUBLE) / CAST(dx AS DOUBLE) END AS slope,
      |  CASE WHEN dx = 0 THEN NULL
      |    ELSE (CAST(sy AS DOUBLE)
      |      - (CAST(num AS DOUBLE) / CAST(dx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |      / CAST(n AS DOUBLE) END AS intercept,
      |  CASE WHEN dx = 0 OR dy = 0 THEN NULL
      |    ELSE (CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))
      |       * (CAST(num AS DOUBLE) / (sqrt(CAST(dx AS DOUBLE)) * sqrt(CAST(dy AS DOUBLE))))
      |  END AS r2
      |FROM e
      |ORDER BY grp""".stripMargin

  /** Gate `ab_welch`: every event-type pair compared on whole-unit
    * event values (var ≈ 2.5e3 → the dvar guard operand is n²·var,
    * clear of 2⁵³ even at 50× stress). */
  def welchGate(spark: SparkSession, d: String): DataFrame =
    welchTTest(Tables.events(spark, d).select(
        col("event_type"),
        floor(col("value") + 0.5).cast("long").as("v")),
      "event_type", "v")
      .orderBy(col("grp_a"), col("grp_b"))

  val welchSql: String =
    """WITH u AS (
      |  SELECT event_type AS grp, CAST(floor(value + 0.5) AS BIGINT) AS x
      |  FROM events),
      |s AS (
      |  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(x*x) AS BIGINT) AS sxx
      |  FROM u GROUP BY grp HAVING COUNT(*) >= 2),
      |e AS (
      |  SELECT grp, n,
      |    CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS m,
      |    CAST(n*sxx - sx*sx AS DOUBLE) / CAST(n*(n-1) AS DOUBLE) AS v,
      |    CAST(n AS DOUBLE) AS nd
      |  FROM s)
      |SELECT a.grp AS grp_a, b.grp AS grp_b, a.n AS n_a, b.n AS n_b,
      |  a.m AS mean_a, b.m AS mean_b,
      |  CASE WHEN a.v/a.nd + b.v/b.nd = 0 THEN NULL
      |    ELSE (a.m - b.m) / sqrt(a.v/a.nd + b.v/b.nd) END AS t,
      |  CASE WHEN a.v/a.nd + b.v/b.nd = 0 THEN NULL
      |    ELSE ((a.v/a.nd + b.v/b.nd) * (a.v/a.nd + b.v/b.nd))
      |      / ((a.v/a.nd) * (a.v/a.nd) / (a.nd - 1.0)
      |        + (b.v/b.nd) * (b.v/b.nd) / (b.nd - 1.0)) END AS df
      |FROM e a JOIN e b ON a.grp < b.grp
      |ORDER BY grp_a, grp_b""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "ols_trend" -> olsTrendGate _,
    "ab_welch" -> welchGate _)

  val oracles: Map[String, String] = Map(
    "ols_trend" -> olsTrendSql,
    "ab_welch" -> welchSql)
}
