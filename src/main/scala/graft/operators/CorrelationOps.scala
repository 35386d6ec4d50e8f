package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B30: single-pass Pearson correlation matrix with EXACT sufficient
  * statistics — the feature-engineering screen ("which candidate
  * features are redundant / leak the label") run as one combinable
  * aggregate over integer-unit columns (the q1 cents convention:
  * callers discretize to integer units first, so every sum is exact
  * decimal arithmetic, immune to the accumulation-order
  * nondeterminism that makes naive float corr differ run-to-run, let
  * alone engine-to-engine).
  *
  * Shape: ONE scan computing n, Σx per column and Σxy per pair
  * (p + p·(p+1)/2 + 1 combinable sums — map-side partial, 1-row
  * result), then p·(p−1)/2 projections on that 1-row frame. No second
  * pass, no per-pair scans, no driver math.
  *
  * Exactness contract: sums accumulate in decimal(38,0) (exact to
  * 10³⁸ — loud NULL-on-overflow past it, never silent wraparound);
  * the final corr = (n·Σxy − ΣxΣy) / (√(n·Σxx − Σx²)·√(n·Σyy − Σy²))
  * casts each operand to double ONLY after a 2⁵³ magnitude guard
  * (below 2⁵³ the cast is exact in every engine; past it,
  * decimal→double rounding is implementation-defined — DuckDB's
  * hugeint cast double-rounds — so the operator REFUSES loudly rather
  * than hash-drift), then sqrt/multiply/divide are single IEEE ops,
  * bit-identical cross-engine. A zero-variance column yields NULL
  * corr (pinned, not NaN). The guard binds at n²·var(units) ≈ 2⁵³,
  * i.e. n ≈ √(2⁵³/var) — about 6M rows for TPC-H-quantity-scale
  * variance (var ≈ 200), smaller for cents-scale columns. Past it the
  * operator REFUSES (stress-asserted at 50×: the refusal is loud,
  * never a silent rounding) and the scale path is `corrMatrixFast`,
  * plain double sums whose ≤-ulps drift is spec-bounded against this
  * exact form at test SF — statistically irrelevant at the row counts
  * where it engages, but not hash-reproducible, so it is not gated.
  */
object CorrelationOps {

  private val Dec = "decimal(38,0)"
  private val MaxExact = math.pow(2, 53)

  /** Exact-cast guard: refuse rather than round past 2⁵³. */
  private def safeDouble(c: Column, what: String): Column =
    when(abs(c) >= lit(MaxExact).cast(Dec),
      raise_error(concat(lit(s"corrMatrix: |$what| >= 2^53, "
        + "decimal->double cast would round engine-dependently; "
        + "use corrMatrixFast or smaller units: "), c.cast("string"))))
      .otherwise(c.cast("double"))

  private def sName(a: String, b: String) = s"_s_${a}__${b}"

  /** Correlation matrix over integer-valued columns (cast to exact
    * decimal internally; the caller owns the unit discretization).
    * Output: (col_x, col_y, n, sxy, corr) for each i<j pair. */
  def corrMatrix(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, s"duplicate in $cols")
    val aggs: Seq[Column] =
      Seq(count(lit(1)).cast(Dec).as("_n")) ++
        cols.map(c => sum(col(c).cast(Dec)).as(sName(c, ""))) ++
        (for { i <- cols.indices; j <- i until cols.size } yield
          sum(col(cols(i)).cast(Dec) * col(cols(j)).cast(Dec))
            .as(sName(cols(i), cols(j))))
    val stats = df.agg(aggs.head, aggs.tail: _*)
    // one struct per pair, all derived from the SAME 1-row aggregate,
    // exploded — a union of per-pair projections would re-run the
    // corpus aggregate once per pair
    val perPair = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield {
        val (x, y) = (cols(i), cols(j))
        val n = col("_n")
        val num = n * col(sName(x, y)) - col(sName(x, "")) * col(sName(y, ""))
        val d1 = n * col(sName(x, x)) - col(sName(x, "")) * col(sName(x, ""))
        val d2 = n * col(sName(y, y)) - col(sName(y, "")) * col(sName(y, ""))
        struct(
          lit(x).as("col_x"), lit(y).as("col_y"),
          col("_n").cast("long").as("n"),
          col(sName(x, y)).cast("long").as("sxy"),
          when(d1 === 0 || d2 === 0, lit(null).cast("double"))
            .otherwise(safeDouble(num, "numerator") /
              (sqrt(safeDouble(d1, "var_x")) * sqrt(safeDouble(d2, "var_y"))))
            .as("corr"))
      }
    stats.select(explode(array(perPair: _*)).as("_p")).select("_p.*")
  }

  /** Scale path: plain double sums (map-side combinable, no magnitude
    * bound). Accumulation order makes the last ulps engine- and
    * run-dependent, so this form is NOT oracle-gated; its drift vs
    * `corrMatrix` is spec-bounded at test SF. */
  def corrMatrixFast(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.size >= 2, "need at least two columns")
    require(cols.distinct.size == cols.size, s"duplicate in $cols")
    val exprs = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield corr(col(cols(i)), col(cols(j)))
        .as(s"${cols(i)}__${cols(j)}")
    val wide = df.agg(exprs.head, exprs.tail: _*)
    val rows = for { i <- cols.indices; j <- (i + 1) until cols.size }
      yield struct(lit(cols(i)).as("col_x"), lit(cols(j)).as("col_y"),
        col(s"${cols(i)}__${cols(j)}").as("corr"))
    wide.select(explode(array(rows: _*)).as("_p")).select("_p.*")
  }

  /** Gated entry (`corr_matrix`): the quantity/discount/tax trio in
    * natural integer units (quantity is integral; discount and tax
    * become percent points) — every operand sits far below 2⁵³ at any
    * tested SF, so the exact path runs guard-clean. */
  def corrMatrixGate(spark: SparkSession, d: String): DataFrame =
    corrMatrix(
      Tables.load(spark, d, "lineitem").select(
        floor(col("l_quantity") + 0.5).cast("long").as("qty"),
        floor(col("l_discount") * 100 + 0.5).cast("long").as("disc_pct"),
        floor(col("l_tax") * 100 + 0.5).cast("long").as("tax_pct")),
      Seq("qty", "disc_pct", "tax_pct"))
      .orderBy(col("col_x"), col("col_y"))

  val corrMatrixSql: String =
    """WITH u AS (
      |  SELECT CAST(floor(l_quantity + 0.5) AS BIGINT) AS qty,
      |    CAST(floor(l_discount * 100 + 0.5) AS BIGINT) AS disc_pct,
      |    CAST(floor(l_tax * 100 + 0.5) AS BIGINT) AS tax_pct
      |  FROM lineitem),
      |s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(qty) AS BIGINT) AS sq, CAST(SUM(disc_pct) AS BIGINT) AS sd,
      |    CAST(SUM(tax_pct) AS BIGINT) AS st,
      |    CAST(SUM(qty*qty) AS BIGINT) AS sqq,
      |    CAST(SUM(disc_pct*disc_pct) AS BIGINT) AS sdd,
      |    CAST(SUM(tax_pct*tax_pct) AS BIGINT) AS stt,
      |    CAST(SUM(qty*disc_pct) AS BIGINT) AS sqd,
      |    CAST(SUM(qty*tax_pct) AS BIGINT) AS sqt,
      |    CAST(SUM(disc_pct*tax_pct) AS BIGINT) AS sdt
      |  FROM u),
      |p AS (
      |  SELECT 'qty' AS col_x, 'disc_pct' AS col_y, n, sqd AS sxy,
      |    n*sqd - sq*sd AS num, n*sqq - sq*sq AS d1, n*sdd - sd*sd AS d2
      |  FROM s
      |  UNION ALL
      |  SELECT 'qty', 'tax_pct', n, sqt,
      |    n*sqt - sq*st, n*sqq - sq*sq, n*stt - st*st FROM s
      |  UNION ALL
      |  SELECT 'disc_pct', 'tax_pct', n, sdt,
      |    n*sdt - sd*st, n*sdd - sd*sd, n*stt - st*st FROM s)
      |SELECT col_x, col_y, n, sxy,
      |  CASE WHEN d1 = 0 OR d2 = 0 THEN NULL
      |    ELSE CAST(num AS DOUBLE)
      |      / (sqrt(CAST(d1 AS DOUBLE)) * sqrt(CAST(d2 AS DOUBLE)))
      |  END AS corr
      |FROM p
      |ORDER BY col_x, col_y""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "corr_matrix" -> corrMatrixGate _)

  val oracles: Map[String, String] = Map(
    "corr_matrix" -> corrMatrixSql)
}
