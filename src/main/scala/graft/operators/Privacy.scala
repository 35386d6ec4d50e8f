package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** G36: structured-data privacy verbs — the governance layer a
  * training-data pipeline runs BEFORE a roster-derived table leaves the
  * trust boundary (the free-text sibling is E6 `text_redact`; this
  * family covers the columns with schemas): k-anonymity auditing
  * (Sweeney 2002 — every quasi-identifier combination must be shared
  * by ≥ k rows or its rows are re-identifiable by linking), l-diversity
  * (Machanavajjhala 2007 — a k-anonymous group whose sensitive value
  * is CONSTANT still leaks it; require ≥ l distinct sensitive values),
  * suppression (drop the rows k-anonymity flags), and deterministic
  * pseudonymization (salted SHA-256 tokens that preserve joinability
  * across tables under one salt without exposing the raw key).
  *
  * Scale: the audit is ONE combinable groupBy over the quasi-id tuple
  * (count + exact distinct-sensitive per group via a two-level
  * aggregate); suppression is the same aggregate + a LEFT SEMI back on
  * the quasi keys (two keyed shuffles, no window); pseudonymization is
  * row-local codegen (sha2). Nothing collects, nothing all-pairs.
  *
  * Exactness: group sizes and distinct counts are exact integers;
  * sha2-256 over identical bytes is bit-identical in every engine —
  * the whole family is oracle-checkable, and `k_anonymity` +
  * `pseudonymize` are gated.
  */
object Privacy {

  /** Per quasi-id group: size `n`, distinct non-null sensitive values
    * `l_div`, and the k-anonymity verdict `suppressed` (n < k). The
    * audit a reviewer reads before releasing the table. */
  def kAnonymityReport(df: DataFrame, quasiIds: Seq[String],
      sensitive: String, k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier")
    require(k >= 1, s"k $k")
    val qs = quasiIds.map(col)
    df.groupBy(qs: _*)
      .agg(count(lit(1)).as("n"),
        count_distinct(col(sensitive)).as("l_div"))
      .withColumn("suppressed", col("n") < k)
  }

  /** k-anonymity enforcement: keep only rows whose quasi-id group has
    * ≥ k members. NULL quasi values form their own group (null-safe
    * grouping — an all-null quasi tuple is itself a linkable
    * signature, so it suppresses like any other small group). */
  def suppress(df: DataFrame, quasiIds: Seq[String], k: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier")
    require(k >= 1, s"k $k")
    val qs = quasiIds.map(col)
    val big = df.groupBy(qs: _*).agg(count(lit(1)).as("_n"))
      .filter(col("_n") >= k).drop("_n")
    // null-safe semi join: groupBy grouped nulls together, the join
    // must match them the same way or null-quasi rows leak through
    val cond = quasiIds.map(c => df(c) <=> big(c)).reduce(_ && _)
    df.join(big, cond, "left_semi")
  }

  /** l-diversity enforcement (the audit's `l_div` made a gate): keep
    * only rows whose quasi-id group has ≥ k members AND ≥ l distinct
    * non-null sensitive values. A k-anonymous group with a constant
    * sensitive value still discloses it to anyone who can place a
    * person in the group — k alone is not release-safe. Same two-
    * shuffle shape as `suppress` (one combinable aggregate + one
    * null-safe left-semi); null quasi tuples suppress like any group,
    * and null sensitive values never count toward l. */
  def enforceLDiversity(df: DataFrame, quasiIds: Seq[String],
      sensitive: String, k: Long, l: Long): DataFrame = {
    require(quasiIds.nonEmpty, "at least one quasi-identifier")
    require(k >= 1 && l >= 1, s"k $k / l $l")
    val qs = quasiIds.map(col)
    val ok = df.groupBy(qs: _*)
      .agg(count(lit(1)).as("_n"),
        count_distinct(col(sensitive)).as("_l"))
      .filter(col("_n") >= k && col("_l") >= l).drop("_n", "_l")
    val cond = quasiIds.map(c => df(c) <=> ok(c)).reduce(_ && _)
    df.join(ok, cond, "left_semi")
  }

  /** Deterministic pseudonymization: each named column is replaced by
    * lowercase hex SHA-256 of salt || string-image. One salt shared
    * across tables keeps foreign keys joinable on tokens; rotating the
    * salt unlinks every prior release. NULL stays NULL (a token for
    * NULL would manufacture a joinable value). Raw speed: row-local,
    * codegen'd, no state. Irreversibility caveat stated honestly: a
    * LOW-ENTROPY column (10⁶ possible ids) is brute-forceable by
    * anyone holding the salt — pseudonymization is scope reduction,
    * not encryption; keep the salt secret and rotate per release. */
  def pseudonymize(df: DataFrame, cols: Seq[String],
      salt: String): DataFrame = {
    require(cols.nonEmpty, "at least one column")
    require(salt.nonEmpty, "empty salt defeats the purpose")
    cols.foldLeft(df)((acc, c) =>
      acc.withColumn(c,
        when(col(c).isNotNull,
          sha2(concat(lit(salt), col(c).cast("string")), 256))))
  }

  /** Gated entry (`k_anonymity`): the audit over the customer roster
    * with (nation, segment) as the quasi tuple and the account balance
    * sensitive — exact group sizes, exact distinct-sensitive counts,
    * and the k=50 verdict, all integer/boolean arithmetic both
    * engines re-derive identically. */
  def kAnonymityGate(spark: SparkSession, d: String): DataFrame =
    kAnonymityReport(graft.Tables.load(spark, d, "customer"),
      Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 50)
      .orderBy(col("c_nationkey"), col("c_mktsegment"))

  val kAnonymitySql: String =
    """SELECT c_nationkey, c_mktsegment, COUNT(*) AS n,
      |  COUNT(DISTINCT c_acctbal) AS l_div,
      |  COUNT(*) < 50 AS suppressed
      |FROM customer
      |GROUP BY c_nationkey, c_mktsegment
      |ORDER BY c_nationkey, c_mktsegment""".stripMargin

  /** Gated entry (`pseudonymize`): salted-SHA-256 tokens are
    * bit-identical cross-engine over the same string image — gate the
    * token derivation AND the null rule on a roster slice. */
  def pseudonymizeGate(spark: SparkSession, d: String): DataFrame =
    pseudonymize(
      graft.Tables.load(spark, d, "customer")
        .select(col("c_custkey"), col("c_name"), col("c_mktsegment")),
      Seq("c_name"), salt = "graft-r12")
      .orderBy(col("c_custkey"))

  val pseudonymizeSql: String =
    """SELECT c_custkey, sha256('graft-r12' || c_name) AS c_name,
      |  c_mktsegment
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  /** Gated entry (`l_diversity`): enforcement over the roster at
    * k=3, l=3 on (nation, segment) / acctbal — kept rows are exact
    * set arithmetic both engines re-derive (the quasi keys are
    * non-null here, so the oracle's plain-equality semi join matches
    * the operator's null-safe one). */
  def lDiversityGate(spark: SparkSession, d: String): DataFrame =
    enforceLDiversity(graft.Tables.load(spark, d, "customer"),
      Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 3, l = 3)
      .select(col("c_custkey"), col("c_nationkey"), col("c_mktsegment"),
        col("c_acctbal"))
      .orderBy(col("c_custkey"))

  val lDiversitySql: String =
    """WITH ok AS (
      |  SELECT c_nationkey, c_mktsegment FROM customer
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 3 AND COUNT(DISTINCT c_acctbal) >= 3)
      |SELECT c.c_custkey, c.c_nationkey, c.c_mktsegment, c.c_acctbal
      |FROM customer c
      |JOIN ok ON c.c_nationkey = ok.c_nationkey
      |       AND c.c_mktsegment = ok.c_mktsegment
      |ORDER BY c_custkey""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "k_anonymity" -> kAnonymityGate _,
    "pseudonymize" -> pseudonymizeGate _,
    "l_diversity" -> lDiversityGate _)

  val oracles: Map[String, String] = Map(
    "k_anonymity" -> kAnonymitySql,
    "pseudonymize" -> pseudonymizeSql,
    "l_diversity" -> lDiversitySql)
}
