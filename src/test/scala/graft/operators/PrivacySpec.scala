package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** G36 privacy verbs: k-anonymity audit arithmetic, l-diversity counts,
  * null-safe suppression (null quasi tuples suppress like any group),
  * pseudonymization determinism / joinability / null rule / salt
  * rotation, and the no-window two-shuffle shape of suppress. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  // (id, city, segment, salary): city+segment = quasi tuple.
  //  - ("a", "x") has 3 rows but only ONE distinct salary -> k-anon at
  //    k<=3 yet l-diversity 1 (the leak k-anonymity cannot see)
  //  - ("b", "y") has 2 rows, distinct salaries
  //  - ("c", null) and (null, null) are singleton groups
  private def fixture = Seq(
    (1L, Some("a"), Some("x"), Some(100.0)),
    (2L, Some("a"), Some("x"), Some(100.0)),
    (3L, Some("a"), Some("x"), Some(100.0)),
    (4L, Some("b"), Some("y"), Some(200.0)),
    (5L, Some("b"), Some("y"), Some(300.0)),
    (6L, Some("c"), Option.empty[String], Some(400.0)),
    (7L, Option.empty[String], Option.empty[String], Option.empty[Double])
  ).toDF("id", "city", "segment", "salary")

  test("kAnonymityReport: exact group sizes, distinct-sensitive " +
    "l_div (nulls excluded), verdict at k") {
    val rep = Privacy.kAnonymityReport(fixture, Seq("city", "segment"),
      "salary", k = 2)
      .collect()
      .map(r => (Option(r.getAs[String]("city")),
        Option(r.getAs[String]("segment"))) -> r).toMap
    assert(rep.size === 4)
    val ax = rep((Some("a"), Some("x")))
    assert(ax.getAs[Long]("n") === 3L)
    assert(ax.getAs[Long]("l_div") === 1L) // constant salary: l=1
    assert(!ax.getAs[Boolean]("suppressed"))
    val by = rep((Some("b"), Some("y")))
    assert(by.getAs[Long]("n") === 2L && by.getAs[Long]("l_div") === 2L)
    assert(!by.getAs[Boolean]("suppressed"))
    // null quasi values form their own groups, and a null sensitive
    // contributes 0 to l_div
    val nn = rep((None, None))
    assert(nn.getAs[Long]("n") === 1L && nn.getAs[Long]("l_div") === 0L)
    assert(nn.getAs[Boolean]("suppressed"))
    assert(rep((Some("c"), None)).getAs[Boolean]("suppressed"))
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(fixture, Seq(), "salary", 2) }
    intercept[IllegalArgumentException] {
      Privacy.kAnonymityReport(fixture, Seq("city"), "salary", 0) }
  }

  test("suppress: keeps exactly the rows of groups with >= k members; " +
    "null quasi tuples suppress (null-safe join, no leak-through)") {
    val kept = Privacy.suppress(fixture, Seq("city", "segment"), k = 2)
      .select("id").as[Long].collect().sorted
    assert(kept === Array(1L, 2L, 3L, 4L, 5L)) // c/null + null/null gone
    // k=1 keeps everything, including both null-quasi singletons
    assert(Privacy.suppress(fixture, Seq("city", "segment"), 1)
      .count() === 7L)
    // k above the largest group suppresses all rows
    assert(Privacy.suppress(fixture, Seq("city", "segment"), 4)
      .count() === 0L)
  }

  test("suppress plan: one aggregate + left-semi, no window, no " +
    "cartesian") {
    val plan = Privacy.suppress(fixture, Seq("city", "segment"), 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"))
    assert(!plan.contains("Cartesian"))
    assert(plan.contains("LeftSemi"))
  }

  test("enforceLDiversity: k alone keeps the constant-sensitive group, " +
    "l suppresses it; null sensitive never counts toward l") {
    // ("a","x") has n=3 but ONLY ONE distinct salary: passes k=2,
    // fails l=2 — the leak k-anonymity cannot see
    val kOnly = Privacy.suppress(fixture, Seq("city", "segment"), 2)
      .select("id").as[Long].collect().sorted
    assert(kOnly.contains(1L))
    val kl = Privacy.enforceLDiversity(fixture, Seq("city", "segment"),
      "salary", k = 2, l = 2)
      .select("id").as[Long].collect().sorted
    assert(kl === Array(4L, 5L)) // only ("b","y") has n>=2 AND l>=2
    // l=1 degrades to plain k-anonymity EXCEPT all-null-sensitive
    // groups (0 distinct values < 1): id 7's group is n=1 anyway
    assert(Privacy.enforceLDiversity(fixture, Seq("city", "segment"),
      "salary", 1, 1).count() === 6L) // id 7 excluded: l_div = 0
    intercept[IllegalArgumentException] {
      Privacy.enforceLDiversity(fixture, Seq("city"), "salary", 1, 0) }
  }

  test("pseudonymize: deterministic SHA-256 tokens, joinability under " +
    "one salt, null stays null, rotation unlinks") {
    val a = Privacy.pseudonymize(fixture, Seq("city"), "s1")
    val b = Privacy.pseudonymize(fixture, Seq("city"), "s1")
    val c = Privacy.pseudonymize(fixture, Seq("city"), "s2")
    val tokA = a.select("id", "city").as[(Long, Option[String])]
      .collect().toMap
    // exact token: sha-256 of salt || value, lowercase hex
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val expect = md.digest("s1a".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(tokA(1L) === Some(expect))
    assert(tokA(1L) === tokA(2L)) // same value -> same token (joinable)
    assert(tokA(7L) === None)     // NULL stays NULL
    // determinism across invocations; rotation changes every token
    val tokB = b.select("id", "city").as[(Long, Option[String])]
      .collect().toMap
    val tokC = c.select("id", "city").as[(Long, Option[String])]
      .collect().toMap
    assert(tokA === tokB)
    assert(tokC(1L).isDefined && tokC(1L) != tokA(1L))
    // untouched columns survive byte-identical
    assert(a.select("salary").as[Option[Double]].collect().toSet ===
      fixture.select("salary").as[Option[Double]].collect().toSet)
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(fixture, Seq("city"), "") }
    intercept[IllegalArgumentException] {
      Privacy.pseudonymize(fixture, Seq(), "s") }
  }

  test("gates run on the real roster: report covers every customer " +
    "row; pseudonymize preserves row count and key column") {
    val rep = Privacy.kAnonymityGate(spark, sf)
    val roster = graft.Tables.load(spark, sf, "customer")
    assert(rep.agg(sum("n")).as[Long].head === roster.count())
    val ps = Privacy.pseudonymizeGate(spark, sf)
    assert(ps.count() === roster.count())
    assert(ps.select("c_name").distinct().count() ===
      roster.select("c_name").distinct().count())
  }
}
