package graft.operators

import graft.functions.Exact._
import graft.registry.Expectations
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** G35: single-pass data profiling + constraint suggestion — the
  * Deequ-shaped front door to the A25 expectations layer: profile a
  * relation once, read per-column completeness / cardinality / range
  * facts, and let the facts PROPOSE the expectations a pipeline then
  * enforces every refresh (suggest → review → `Expectations.check`).
  * A team that hand-writes constraints for a 400-column table writes
  * none; profiling is how the checks actually get born.
  *
  * Shape: one MELT projection (each row explodes into #cols
  * (column, value) entries — narrow, codegen'd, no driver state), one
  * (column, value) pre-aggregation, one per-column rollup. Two keyed
  * shuffles TOTAL regardless of column count — never a scan per
  * column, and never an Expand-based multi-distinct (same exploded
  * volume, worse skew behavior: hot values pre-combine map-side
  * here). The cost model is honest: the melt multiplies scan volume
  * by #cols — profiling 40 columns of a 100 TB table moves 40× the
  * narrow-column bytes through the first shuffle; batch the column
  * list if that bound matters, the per-column outputs union.
  *
  * Exactness: distinct counts and min/max are EXACT (the profile
  * feeds constraints — an approx distinct that says 9 when the truth
  * is 11 would suggest a OneOf that quarantines live rows).
  * Cross-engine: values profile through their CAST(string) image
  * (both engines print integers and shortest-round-trip doubles
  * identically on this data), numeric means through the dec6 exact
  * decimal convention, top-value ties break to the LARGEST value (the
  * G27 survivorship max-struct rule).
  */
object TableProfile {

  private val numericTypes: Set[DataType] =
    Set(ByteType, ShortType, IntegerType, LongType, FloatType, DoubleType)

  /** Per-column profile, long format: one row per column with
    * (col_name, n_rows, n_null, n_distinct, min_val, max_val,
    * min_num, max_num, top_val, top_n, mean). String-image stats
    * (`min_val`/`max_val`/`top_val`) cover every type; `min_num`/
    * `max_num`/`mean` are null for non-numeric columns. */
  def profile(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(cols.distinct.size == cols.size, s"duplicate columns: $cols")
    val types = df.schema.fields.map(f => f.name -> f.dataType).toMap
    cols.foreach(c => require(types.contains(c), s"no such column: $c"))
    val entries = cols.map { c =>
      val num =
        if (numericTypes.contains(types(c)) ||
            types(c).isInstanceOf[DecimalType]) col(c).cast("double")
        else lit(null).cast("double")
      struct(lit(c).as("col_name"), col(c).cast("string").as("v"),
        num.as("vn"))
    }
    val melted = df.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
    // same string image => same source value for primitive types, so
    // vn is functionally dependent on (col_name, v): min() just picks it
    val byVal = melted.groupBy(col("col_name"), col("v"))
      .agg(count(lit(1)).as("n"), min(col("vn")).as("vn"))
    byVal.groupBy(col("col_name"))
      .agg(
        sum(col("n")).as("n_rows"),
        coalesce(sum(when(col("v").isNull, col("n"))), lit(0L)).as("n_null"),
        count(when(col("v").isNotNull, lit(1))).as("n_distinct"),
        min(col("v")).as("min_val"),
        max(col("v")).as("max_val"),
        min(col("vn")).as("min_num"),
        max(col("vn")).as("max_num"),
        max(when(col("v").isNotNull, struct(col("n"), col("v").as("tv"))))
          .getField("tv").as("top_val"),
        max(when(col("v").isNotNull, struct(col("n"), col("v").as("tv"))))
          .getField("n").as("top_n"),
        (dbl(sum(dec6(col("vn")) * col("n"))) /
          sum(when(col("vn").isNotNull, col("n")))).as("mean"))
  }

  /** Constraint suggestion from a computed profile (columns-sized
    * frame — the collect is bounded by the column list):
    * zero-null columns suggest [[Expectations.NotNull]]; numeric
    * columns suggest [[Expectations.InRange]] on the OBSERVED
    * [min, max] (the Deequ convention: the suggested range states
    * today's envelope — a reviewer widens it before enforcement if
    * the domain allows more); string columns at or under `maxOneOf`
    * distinct values suggest [[Expectations.OneOf]], with the allowed
    * list re-derived in one pass over exactly the qualifying columns.
    * Suggestions HOLD on the profiled data by construction (spec'd) —
    * they are a starting point a human reviews, not a verdict. */
  def suggest(df: DataFrame, profiled: DataFrame,
      maxOneOf: Int = 10): Seq[Expectations.Rule] = {
    require(maxOneOf >= 1, s"maxOneOf $maxOneOf")
    val rows = profiled.collect()
    val notNull = rows.filter(_.getAs[Long]("n_null") == 0L)
      .map(r => Expectations.NotNull(r.getAs[String]("col_name")))
    val ranges = rows.filter(r => !r.isNullAt(r.fieldIndex("min_num")))
      .map(r => Expectations.InRange(r.getAs[String]("col_name"),
        r.getAs[Double]("min_num"), r.getAs[Double]("max_num")))
    val oneOfCols = rows.filter(r => r.isNullAt(r.fieldIndex("min_num")) &&
        r.getAs[Long]("n_distinct") <= maxOneOf &&
        r.getAs[Long]("n_distinct") > 0L)
      .map(_.getAs[String]("col_name")).toSeq
    val oneOf =
      if (oneOfCols.isEmpty) Nil
      else {
        val entries = oneOfCols.map(c =>
          struct(lit(c).as("c"), col(c).cast("string").as("v")))
        df.select(explode(array(entries: _*)).as("e")).select(col("e.*"))
          .filter(col("v").isNotNull).distinct().collect()
          .groupBy(_.getAs[String]("c"))
          .map { case (c, vs) =>
            Expectations.OneOf(c, vs.map(_.getAs[String]("v")).toSeq.sorted)
          }.toSeq.sortBy(_.colName)
      }
    (notNull ++ ranges ++ oneOf).toSeq
  }

  /** Gated entry (`table_profile`): the full profile of the customer
    * table — completeness, exact cardinality, string-image extrema,
    * numeric envelope, modal value (largest-on-tie), exact-decimal
    * mean — re-derived per column by DuckDB. */
  def tableProfileGate(spark: SparkSession, d: String): DataFrame = {
    val cust = graft.Tables.load(spark, d, "customer")
    profile(cust, Seq("c_custkey", "c_name", "c_nationkey", "c_acctbal",
        "c_mktsegment"))
      .orderBy(col("col_name"))
  }

  val tableProfileSql: String = {
    def one(c: String, numeric: Boolean): String = {
      val minNum = if (numeric) s"MIN(CAST($c AS DOUBLE))" else "CAST(NULL AS DOUBLE)"
      val maxNum = if (numeric) s"MAX(CAST($c AS DOUBLE))" else "CAST(NULL AS DOUBLE)"
      val mean =
        if (numeric)
          s"CAST(SUM(CAST($c AS DECIMAL(18,6))) AS DOUBLE) / COUNT($c)"
        else "CAST(NULL AS DOUBLE)"
      s"""SELECT '$c' AS col_name, COUNT(*) AS n_rows,
        |  COUNT(*) - COUNT($c) AS n_null,
        |  COUNT(DISTINCT CAST($c AS VARCHAR)) AS n_distinct,
        |  MIN(CAST($c AS VARCHAR)) AS min_val,
        |  MAX(CAST($c AS VARCHAR)) AS max_val,
        |  $minNum AS min_num, $maxNum AS max_num,
        |  (SELECT v FROM (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS n
        |     FROM customer WHERE $c IS NOT NULL GROUP BY 1
        |     ORDER BY n DESC, v DESC LIMIT 1)) AS top_val,
        |  (SELECT n FROM (SELECT CAST($c AS VARCHAR) AS v, COUNT(*) AS n
        |     FROM customer WHERE $c IS NOT NULL GROUP BY 1
        |     ORDER BY n DESC, v DESC LIMIT 1)) AS top_n,
        |  $mean AS mean
        |FROM customer""".stripMargin
    }
    Seq(one("c_acctbal", numeric = true), one("c_custkey", numeric = true),
      one("c_mktsegment", numeric = false), one("c_name", numeric = false),
      one("c_nationkey", numeric = true))
      .mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "table_profile" -> tableProfileGate _)

  val oracles: Map[String, String] = Map(
    "table_profile" -> tableProfileSql)
}
