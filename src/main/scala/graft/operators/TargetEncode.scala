package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A32/A33: supervised categorical encodings — the feature-store verbs
  * that turn a high-cardinality category into a model-ready numeric
  * using the TARGET, with the leakage controls that make them safe:
  *
  *  - m-estimate smoothing (`mEstimate`): category target mean shrunk
  *    toward the global prior by pseudo-count m — the standard
  *    high-cardinality encoder (rare categories pull to the prior
  *    instead of memorizing noise).
  *  - leave-one-out (`looEncode`): each ROW's encoding excludes its own
  *    target — the per-row leakage control for training-time encoding.
  *    A singleton category pins NULL (its LOO set is empty).
  *  - weight of evidence (`woe`): per-category log-odds vs the corpus
  *    under a pinned add-λ rule (the DriftMonitor smoothing
  *    convention), the credit-scoring/binning companion; information
  *    value rides as the un-gated `informationValue` summary (a
  *    category-unordered double sum — deterministic per engine, not
  *    bit-portable across them, the corrMatrixFast adjudication).
  *
  * Exactness: targets are caller-discretized integer units summed in
  * decimal(38,0) (the B30 contract) with the 2⁵³ cast guard; every
  * encoding is then a SHORT PINNED IEEE chain (gated hash-exact; WOE's
  * `ln` rides the drift_hist precedent — Java's and DuckDB's ln agree
  * bit-for-bit on these operand classes, proven by two rounds of
  * drift-gate hashes).
  *
  * Scale: ONE corpus aggregation to category-sized frames; encodings
  * join back BROADCAST (categories ≪ rows by the operator's premise);
  * LOO is a projection over that join — the corpus is scanned once and
  * never shuffled on rows.
  */
object TargetEncode {

  private val Dec = "decimal(38,0)"
  private val MaxExact = math.pow(2, 53)

  private def safeDouble(c: Column, what: String): Column =
    when(abs(c) >= lit(MaxExact).cast(Dec),
      raise_error(concat(lit(s"TargetEncode: |$what| >= 2^53, "
        + "decimal->double cast would round engine-dependently; "
        + "use smaller units: "), c.cast("string"))))
      .otherwise(c.cast("double"))

  /** Per-category stats + both encodings joined back per row:
    * (idCol, catCol, target, enc_loo, enc_smooth). */
  def encode(df: DataFrame, idCol: String, catCol: String,
             targetCol: String, m: Double = 20.0): DataFrame = {
    require(m > 0, s"m must be positive, got $m")
    val y = col(targetCol).cast(Dec)
    val cats = df.groupBy(col(catCol))
      .agg(count(lit(1)).cast(Dec).as("_n"), sum(y).as("_s"))
    val tot = df.agg(count(lit(1)).cast(Dec).as("_nt"), sum(y).as("_st"))
    val prior = safeDouble(col("_st"), "sum_total") /
      safeDouble(col("_nt"), "n_total")
    val enriched = cats.crossJoin(broadcast(tot)) // 1-row totals
      .select(col(catCol), col("_n"), col("_s"),
        ((safeDouble(col("_s"), "sum_cat") + lit(m) * prior) /
          (safeDouble(col("_n"), "n_cat") + lit(m))).as("enc_smooth"))
    df.select(col(idCol), col(catCol), col(targetCol))
      .join(broadcast(enriched), Seq(catCol))
      .select(col(idCol), col(catCol),
        col(targetCol).cast("long").as("target"),
        when(col("_n") === lit(1).cast(Dec), lit(null).cast("double"))
          .otherwise((safeDouble(col("_s"), "sum_cat") -
            col(targetCol).cast("double")) /
            (safeDouble(col("_n"), "n_cat") - lit(1.0))).as("enc_loo"),
        col("enc_smooth"))
  }

  /** Category-level m-estimate table (for serving-time encoding of
    * unseen rows): (cat, n, enc_smooth). */
  def mEstimate(df: DataFrame, catCol: String, targetCol: String,
                m: Double = 20.0): DataFrame =
    encode(df.withColumn("_rid", monotonically_increasing_id()),
      "_rid", catCol, targetCol, m)
      .groupBy(col(catCol))
      .agg(count(lit(1)).as("n"), first(col("enc_smooth")).as("enc_smooth"))

  /** Per-category weight of evidence under add-λ smoothing:
    * woe_c = ln( ((g_c+λ)/(G+λK)) / ((b_c+λ)/(B+λK)) ), K = #categories.
    * Output: (cat, n_good, n_bad, woe). */
  def woe(df: DataFrame, catCol: String, labelCol: String,
          lambda: Double = 0.5): DataFrame = {
    require(lambda > 0, s"lambda must be positive, got $lambda")
    val cats = df.groupBy(col(catCol)).agg(
      count(when(col(labelCol), lit(1))).as("n_good"),
      count(when(!col(labelCol), lit(1))).as("n_bad"))
    val tot = cats.agg(sum(col("n_good")).as("_g"), sum(col("n_bad")).as("_b"),
      count(lit(1)).as("_k"))
    cats.crossJoin(broadcast(tot))
      .select(col(catCol), col("n_good"), col("n_bad"),
        log(((col("n_good").cast("double") + lit(lambda)) /
              (col("_g").cast("double") + lit(lambda) * col("_k").cast("double"))) /
            ((col("n_bad").cast("double") + lit(lambda)) /
              (col("_b").cast("double") + lit(lambda) * col("_k").cast("double"))))
          .as("woe"))
  }

  /** Information value Σ (pg − pb)·woe_c over the smoothed proportions.
    * Deterministic within an engine, category-order-dependent in the
    * last ulps across engines — library summary, not gated. */
  def informationValue(woeDf: DataFrame, lambda: Double = 0.5): Double = {
    val tot = woeDf.agg(sum(col("n_good")).as("_g"), sum(col("n_bad")).as("_b"),
      count(lit(1)).as("_k"))
    woeDf.crossJoin(broadcast(tot))
      .select((((col("n_good").cast("double") + lit(lambda)) /
          (col("_g").cast("double") + lit(lambda) * col("_k").cast("double"))) -
        ((col("n_bad").cast("double") + lit(lambda)) /
          (col("_b").cast("double") + lit(lambda) * col("_k").cast("double"))))
        * col("woe") as "_iv")
      .agg(sum(col("_iv"))).collect().head.getDouble(0)
  }

  // ---------------------------------------------------------------- gates

  /** Gate `target_encode`: both leakage-controlled encodings of order
    * priority against the order's total price in cents. */
  def encodeGate(spark: SparkSession, d: String): DataFrame =
    encode(Tables.orders(spark, d).select(
        col("o_orderkey"), col("o_orderpriority"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents")),
      "o_orderkey", "o_orderpriority", "cents", m = 20.0)
      .orderBy(col("o_orderkey"))

  val encodeSql: String =
    """WITH u AS (
      |  SELECT o_orderkey, o_orderpriority,
      |    CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      |  FROM orders),
      |c AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(cents) AS BIGINT) AS s
      |  FROM u GROUP BY o_orderpriority),
      |t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS nt, CAST(SUM(cents) AS BIGINT) AS st
      |  FROM u)
      |SELECT u.o_orderkey, u.o_orderpriority, u.cents AS target,
      |  CASE WHEN c.n = 1 THEN NULL
      |    ELSE (CAST(c.s AS DOUBLE) - CAST(u.cents AS DOUBLE))
      |         / (CAST(c.n AS DOUBLE) - 1.0) END AS enc_loo,
      |  (CAST(c.s AS DOUBLE) + 20.0 * (CAST(t.st AS DOUBLE) / CAST(t.nt AS DOUBLE)))
      |    / (CAST(c.n AS DOUBLE) + 20.0) AS enc_smooth
      |FROM u JOIN c ON u.o_orderpriority = c.o_orderpriority
      |CROSS JOIN t
      |ORDER BY u.o_orderkey""".stripMargin

  /** Gate `woe_bins`: WOE of order priority against the
    * fulfilled-status label. */
  def woeGate(spark: SparkSession, d: String): DataFrame =
    woe(Tables.orders(spark, d).select(
        col("o_orderpriority"), (col("o_orderstatus") === "F").as("ful")),
      "o_orderpriority", "ful", lambda = 0.5)
      .orderBy(col("o_orderpriority"))

  val woeSql: String =
    """WITH c AS (
      |  SELECT o_orderpriority,
      |    CAST(COUNT(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS BIGINT) AS n_good,
      |    CAST(COUNT(CASE WHEN NOT (o_orderstatus = 'F') THEN 1 END) AS BIGINT) AS n_bad
      |  FROM orders GROUP BY o_orderpriority),
      |t AS (
      |  SELECT CAST(SUM(n_good) AS BIGINT) AS g, CAST(SUM(n_bad) AS BIGINT) AS b,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM c)
      |SELECT c.o_orderpriority, c.n_good, c.n_bad,
      |  ln(((CAST(c.n_good AS DOUBLE) + 0.5)
      |        / (CAST(t.g AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)))
      |     / ((CAST(c.n_bad AS DOUBLE) + 0.5)
      |        / (CAST(t.b AS DOUBLE) + 0.5 * CAST(t.k AS DOUBLE)))) AS woe
      |FROM c CROSS JOIN t
      |ORDER BY c.o_orderpriority""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "target_encode" -> encodeGate _,
    "woe_bins" -> woeGate _)

  val oracles: Map[String, String] = Map(
    "target_encode" -> encodeSql,
    "woe_bins" -> woeSql)
}
