package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The URL gate must match domains by suffix inheritance (never the
  * reverse), score words on alphanumeric runs (never substrings), let
  * the allowlist override everything, and fail closed on unparseable
  * addresses — with lists as data and identical output un-broadcast. */
class UrlFiltersSpec extends SparkSpec {
  import spark.implicits._

  private lazy val block = Seq("example.com", "evil.org", "spam.biz")
    .toDF("domain")
  private lazy val allow = Seq("wikipedia.org").toDF("domain")
  private lazy val words =
    Seq(("sex", 0.6), ("pills", 0.5), ("porn", 1.0)).toDF("word", "weight")

  private lazy val docs = Seq(
    1L -> "https://www.example.com/page",          // subdomain inherits block
    2L -> "http://example.com.evil-mirror.net/x",  // prefix is NOT a suffix
    3L -> "https://good.example.com:8080/a?b=c",   // port stripped, blocked
    4L -> "https://en.wikipedia.org/wiki/Essex",   // essex must not fire "sex"
    5L -> "ftp://user:pw@files.host.net/x",        // userinfo stripped, kept
    6L -> "https://shop.site/cheap-pills-sex",     // 0.5 + 0.6 >= 1.0: block
    7L -> "https://shop.site/just-pills",          // 0.5 < 1.0: kept
    8L -> "https://x.net/sex/sex/sex",             // distinct words count once
    9L -> "https://en.wikipedia.org/porn-studies", // allowlist beats strict word
    10L -> "https:///no-host-here",                // unparseable: fail closed
    11L -> "https://evil.org/",                    // exact-domain block
    12L -> "https://spam.biz.good.net/x"           // blocked name as a PREFIX: kept
  ).toDF("doc_id", "url")

  private def run(bc: Boolean = true) =
    UrlFilters.filterUrls(docs, block, words, allow,
      broadcastLists = bc)

  test("verdicts: suffix-inherited domain blocks, run-not-substring word scores, allowlist override, fail-closed parse") {
    val got = run().select("doc_id", "keep", "blocked_domain", "url_score",
        "allowed_domain", "host")
      .as[(Long, Boolean, Option[String], Double, Option[String], Option[String])]
      .collect().map(r => r._1 -> r).toMap
    assert(got.size === 12, "every input row must come back")

    assert(!got(1L)._2 && got(1L)._3.contains("example.com"))
    assert(got(2L)._2 && got(2L)._3.isEmpty,
      "a blocked domain as a HOST PREFIX must not block")
    assert(!got(3L)._2 && got(3L)._3.contains("example.com") &&
      got(3L)._6.contains("good.example.com"), "port must strip")
    assert(got(4L)._2 && got(4L)._4 === 0.0,
      "'sex' fired inside 'essex' — substring matching is forbidden")
    assert(got(5L)._2 && got(5L)._6.contains("files.host.net"),
      "userinfo must strip")
    assert(!got(6L)._2 && math.abs(got(6L)._4 - 1.1) < 1e-12)
    assert(got(7L)._2 && math.abs(got(7L)._4 - 0.5) < 1e-12)
    assert(got(8L)._2 && math.abs(got(8L)._4 - 0.6) < 1e-12,
      "a repeated word must count once")
    assert(got(9L)._2 && got(9L)._5.contains("wikipedia.org"),
      "the allowlist must override a strict word ban")
    assert(!got(10L)._2 && got(10L)._6.isEmpty, "no host ⇒ fail closed")
    assert(!got(11L)._2 && got(11L)._3.contains("evil.org"))
    assert(got(12L)._2, "spam.biz.good.net is not under spam.biz")
  }

  test("un-broadcast lists and any layout give identical verdicts; broadcast plan audit") {
    def collect(df: org.apache.spark.sql.DataFrame) =
      df.select("doc_id", "keep", "url_score")
        .as[(Long, Boolean, Double)].collect().sortBy(_._1).toSeq
    val a = collect(run())
    val b = collect(UrlFilters.filterUrls(docs.repartition(5), block, words,
      allow, broadcastLists = false))
    assert(a === b)
    val plan = run().queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      s"list joins did not broadcast:\n$plan")
    assert(!plan.contains("Exchange SinglePartition"), plan)
  }

  test("maxLabels caps from the deep end: the registered domain still matches under any cap") {
    val deep = Seq(1L -> "https://a.b.c.d.e.f.g.h.example.com/x")
      .toDF("doc_id", "url")
    val got = UrlFilters.filterUrls(deep, block, words, allow, maxLabels = 3)
      .select("keep", "blocked_domain").as[(Boolean, Option[String])].head()
    assert(!got._1 && got._2.contains("example.com"),
      "the cap must drop deep full hosts, never the registered domain")
  }

  test("guards: threshold/maxLabels bounds and missing columns fail loudly") {
    intercept[IllegalArgumentException] {
      UrlFilters.filterUrls(docs, block, words, allow, scoreThreshold = 0.0)
    }
    intercept[IllegalArgumentException] {
      UrlFilters.filterUrls(docs, block, words, allow, maxLabels = 0)
    }
    intercept[IllegalArgumentException] {
      UrlFilters.filterUrls(docs.drop("url"), block, words, allow)
    }
  }
}
