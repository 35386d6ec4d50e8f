package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** E40 keyword extraction: tf/df arithmetic, the rarer-wins and
  * alphabetical tie breaks, empty-token hygiene, k boundary, and the
  * doc-partitioned window shape. */
class KeywordOpsSpec extends SparkSpec {
  import spark.implicits._

  // "common" appears in all docs (df=3); "rare"/"solo" in one each.
  // doc 1: common x2, rare x2 -> tie on tf=2, rare wins (df 1 < 3)
  private def docs = Seq(
    (1L, "common rare common rare zz"),
    (2L, "common  solo"), // double space -> empty token dropped
    (3L, "common")
  ).toDF("doc_id", "text")

  test("rank order is (tf desc, df asc, term asc); empty tokens drop") {
    val out = KeywordOps.topTerms(docs, "doc_id", "text", 3)
      .collect()
      .map(r => (r.getAs[Long]("doc_id"), r.getAs[Int]("rank")) ->
        (r.getAs[String]("term"), r.getAs[Long]("tf"), r.getAs[Long]("df")))
      .toMap
    assert(out((1L, 1)) === ("rare", 2L, 1L))   // tf tie, rarer first
    assert(out((1L, 2)) === ("common", 2L, 3L))
    assert(out((1L, 3)) === ("zz", 1L, 1L))
    assert(out((2L, 1)) === ("solo", 1L, 1L))   // df tie -> not here:
    assert(out((2L, 2)) === ("common", 1L, 3L)) // rare solo beats common
    assert(out((3L, 1)) === ("common", 1L, 3L))
    assert(!out.contains((2L, 3))) // doc 2 has only 2 distinct terms
  }

  test("alphabetical break on full (tf, df) ties; k truncates") {
    val t = Seq((1L, "b a")).toDF("doc_id", "text")
    val r = KeywordOps.topTerms(t, "doc_id", "text", 1).collect()
    assert(r.length === 1 && r.head.getAs[String]("term") === "a")
    intercept[IllegalArgumentException] {
      KeywordOps.topTerms(t, "doc_id", "text", 0) }
  }

  test("whitespace-only document yields no rows") {
    val t = Seq((1L, "  "), (2L, "x")).toDF("doc_id", "text")
    val ids = KeywordOps.topTerms(t, "doc_id", "text", 3)
      .select("doc_id").as[Long].collect().toSet
    assert(ids === Set(2L))
  }

  test("plan: window partitioned by doc, never a single partition") {
    val plan = KeywordOps.topTerms(docs, "doc_id", "text", 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"))
    assert(!plan.contains("SinglePartition"))
  }

  test("gate on the real corpus: <= 3 rows per doc, ranks contiguous " +
    "from 1, tf monotone non-increasing within a doc") {
    val g = KeywordOps.topTermsGate(spark, sf).collect()
    assert(g.nonEmpty)
    g.groupBy(_.getAs[Long]("doc_id")).foreach { case (_, rs) =>
      val byRank = rs.sortBy(_.getAs[Int]("rank"))
      assert(byRank.map(_.getAs[Int]("rank")).toSeq ===
        (1 to byRank.length))
      val tfs = byRank.map(_.getAs[Long]("tf")).toSeq
      assert(tfs === tfs.sorted.reverse)
    }
  }
}
