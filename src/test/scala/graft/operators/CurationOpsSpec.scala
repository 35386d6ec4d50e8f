package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The mixture is data, not a naming convention: [[CurationOps.mixtureSample]]
  * must work on source names of any shape, keep each source at exactly its
  * declared per-mille rate under the portable md5-bucket hash, and treat
  * undeclared sources by the caller's default — fail-closed unless told
  * otherwise. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  // nothing `srcN` about these names — the round-7 implementation parsed
  // substring(source, 4) as an int and silently fell to the 12.5% band on
  // any other shape; the operator now takes the rate from the table
  private def docs = Seq.tabulate(400) { i =>
    val src = Seq("wikipedia", "common-crawl", "books", "unlisted")(i % 4)
    (i.toLong, src, 100L + i)
  }.toDF("doc_id", "source", "n_chars")

  private def mixture = Seq(
    ("wikipedia", 1000L), ("common-crawl", 250L), ("books", 500L))
    .toDF("source", "keep_per_mille")

  // the E9/E15 portable-hash keep decision, recomputed independently
  private def expectedKeep(docId: Long, perMille: Long): Boolean = {
    val hex = java.security.MessageDigest.getInstance("MD5")
      .digest(docId.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    java.lang.Long.parseLong(hex, 16) % 1000 < perMille
  }

  test("keeps each source at exactly its declared rate; undeclared sources fail closed") {
    val got = CurationOps.mixtureSample(docs, mixture)
      .select("doc_id", "source", "keep")
      .as[(Long, String, Boolean)].collect()
      .map { case (id, src, keep) => id -> ((src, keep)) }.toMap
    assert(got.size === 400)
    got.foreach { case (id, (src, keep)) =>
      val rate = Map("wikipedia" -> 1000L, "common-crawl" -> 250L,
        "books" -> 500L).getOrElse(src, 0L)
      assert(keep === expectedKeep(id, rate),
        s"doc $id from $src: keep=$keep at rate $rate")
    }
    // a 100% source keeps everything, an undeclared one keeps nothing
    assert(got.values.count { case (s, k) => s == "wikipedia" && k } === 100)
    assert(got.values.count { case (s, k) => s == "unlisted" && k } === 0)
  }

  test("defaultPerMille opts undeclared sources back in at the given rate") {
    val kept = CurationOps.mixtureSample(docs, mixture, defaultPerMille = 1000L)
      .filter(col("source") === "unlisted" && col("keep"))
    assert(kept.count() === 100)
  }

  test("the mixture join is a broadcast, and the plan has no shuffle") {
    val plan = CurationOps.mixtureSample(docs, mixture)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"), s"mixture join not broadcast:\n$plan")
    assert(!plan.contains("Exchange hashpartitioning"),
      s"mixtureSample must not shuffle the corpus:\n$plan")
  }
}
