package graft.operators

import graft.SparkSpec
import graft.registry.Expectations
import org.apache.spark.sql.functions._

/** G35 profiling + suggestion: exact per-column facts on a constructed
  * frame (nulls, ties, mixed types), the suggestion rules, the
  * suggestions-hold-by-construction law, and the two-shuffle shape. */
class TableProfileSpec extends SparkSpec {
  import spark.implicits._

  private def fixture = Seq(
    (1L, Some(2.0), Some("a")), (2L, Some(4.0), Some("b")),
    (3L, Some(4.0), Some("b")), (4L, Option.empty[Double],
      Option.empty[String])
  ).toDF("id", "x", "s")

  test("profile: counts, exact distinct, extrema, mode with " +
    "largest-on-tie, exact mean, null numeric stats for strings") {
    val p = TableProfile.profile(fixture, Seq("id", "x", "s"))
      .collect().map(r => r.getAs[String]("col_name") -> r).toMap
    val id = p("id")
    assert(id.getAs[Long]("n_rows") === 4L)
    assert(id.getAs[Long]("n_null") === 0L)
    assert(id.getAs[Long]("n_distinct") === 4L)
    assert(id.getAs[String]("min_val") === "1" &&
      id.getAs[String]("max_val") === "4")
    assert(id.getAs[Double]("min_num") === 1.0 &&
      id.getAs[Double]("max_num") === 4.0)
    assert(id.getAs[Double]("mean") === 2.5)
    assert(id.getAs[Long]("top_n") === 1L)
    assert(id.getAs[String]("top_val") === "4") // all tie at 1 -> largest

    val x = p("x")
    assert(x.getAs[Long]("n_null") === 1L)
    assert(x.getAs[Long]("n_distinct") === 2L)
    assert(x.getAs[String]("top_val") === "4.0" &&
      x.getAs[Long]("top_n") === 2L)
    assert(x.getAs[Double]("mean") === (2.0 + 4.0 + 4.0) / 3)

    val s = p("s")
    assert(s.isNullAt(s.fieldIndex("min_num")) &&
      s.isNullAt(s.fieldIndex("mean")))
    assert(s.getAs[String]("min_val") === "a" &&
      s.getAs[String]("max_val") === "b")

    intercept[IllegalArgumentException] {
      TableProfile.profile(fixture, Seq("id", "id")) }
    intercept[IllegalArgumentException] {
      TableProfile.profile(fixture, Seq("nope")) }
  }

  test("suggest: not-null / observed-range / small-domain one-of, and " +
    "every suggestion holds on the profiled data by construction") {
    val prof = TableProfile.profile(fixture, Seq("id", "x", "s"))
    val rules = TableProfile.suggest(fixture, prof)
    assert(rules.contains(Expectations.NotNull("id")))
    assert(!rules.exists { case Expectations.NotNull(c) => c != "id"
      case _ => false }) // x and s have nulls
    assert(rules.contains(Expectations.InRange("id", 1.0, 4.0)))
    assert(rules.contains(Expectations.InRange("x", 2.0, 4.0)))
    assert(rules.contains(Expectations.OneOf("s", Seq("a", "b"))))
    val report = Expectations.check(fixture, rules)
    assert(report.passed, report.violations.toString)

    // a domain past maxOneOf is not suggested
    val wide = (1 to 20).map(i => (i.toLong, s"v$i")).toDF("id", "s")
    val wprof = TableProfile.profile(wide, Seq("s"))
    assert(TableProfile.suggest(wide, wprof, maxOneOf = 10).collect {
      case o: Expectations.OneOf => o }.isEmpty)
  }

  test("profile is two keyed shuffles regardless of column width — " +
    "no per-column scan, no Expand") {
    val plan = TableProfile.profile(fixture, Seq("id", "x", "s"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Expand"), plan)
    val exchanges = "Exchange hashpartitioning".r
      .findAllIn(plan).size
    assert(exchanges <= 2, s"expected <= 2 shuffles, got $exchanges:\n$plan")
  }

  test("gate shape runs on the real roster and suggestions hold there") {
    val cust = graft.Tables.load(spark, sf, "customer")
    val prof = TableProfile.profile(cust,
      Seq("c_custkey", "c_acctbal", "c_mktsegment"))
    val rules = TableProfile.suggest(cust, prof)
    assert(rules.nonEmpty)
    assert(Expectations.check(cust, rules).passed)
  }
}
