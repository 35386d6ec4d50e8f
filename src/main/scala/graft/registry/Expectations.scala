package graft.registry

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data-quality expectations over a relation — the validation layer a
  * feature store runs before materializing a version (beyond the schema
  * check the reference does). Each rule evaluates in ONE aggregate pass
  * over the data (no per-rule scans): violations are counted with
  * conditional aggregation, so checking 50 rules on 100 TB costs one
  * scan + a 1-row result. */
object Expectations {
  sealed trait Rule { def name: String; def violation: Column }
  final case class NotNull(colName: String) extends Rule {
    val name = s"not_null($colName)"
    val violation: Column = col(colName).isNull
  }
  final case class InRange(colName: String, lo: Double, hi: Double) extends Rule {
    val name = s"in_range($colName,[$lo,$hi])"
    val violation: Column = col(colName) < lo || col(colName) > hi
  }
  final case class MatchesRegex(colName: String, pattern: String) extends Rule {
    val name = s"matches($colName,$pattern)"
    val violation: Column = !col(colName).rlike(pattern)
  }
  final case class OneOf(colName: String, allowed: Seq[String]) extends Rule {
    val name = s"one_of($colName)"
    val violation: Column = !col(colName).isin(allowed: _*)
  }

  final case class Report(rows: Long, violations: Map[String, Long]) {
    def passed: Boolean = violations.values.forall(_ == 0L)
  }

  /** One scan, all rules. */
  def check(df: DataFrame, rules: Seq[Rule]): Report = {
    val aggs = count(lit(1)).as("_rows") +:
      rules.map(r => count(when(r.violation, lit(1))).as(r.name))
    val row = df.agg(aggs.head, aggs.tail: _*).collect()(0)
    Report(row.getAs[Long]("_rows"),
      rules.map(r => r.name -> row.getAs[Long](r.name)).toMap)
  }

  /** Uniqueness needs its own (shuffled) pass — keyed count. */
  def checkUnique(df: DataFrame, cols: Seq[String]): Long =
    df.groupBy(cols.map(col): _*).count().filter(col("count") > 1).count()

  /** Quarantine routing: split a relation into (clean, quarantined),
    * where quarantined rows carry a `_violations` array naming every
    * rule they break. Both sides derive from ONE violation-tagging
    * projection (a narrow codegen'd stage — no shuffle, no collect);
    * writing both sides costs two scans unless the caller persists the
    * tagged frame. This is the enforcement half of [[check]]: counting
    * tells you the corpus is dirty, routing keeps the dirt out of the
    * materialized version while preserving it for inspection. */
  def quarantine(df: DataFrame, rules: Seq[Rule]): (DataFrame, DataFrame) = {
    val tags = array(rules.map(r =>
      when(r.violation, lit(r.name)).otherwise(lit(null))): _*)
    val tagged = df.withColumn("_violations",
      filter(tags, c => c.isNotNull))
    (tagged.filter(size(col("_violations")) === 0).drop("_violations"),
      tagged.filter(size(col("_violations")) > 0))
  }
}
