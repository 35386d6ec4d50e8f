package graft

import graft.bench.PlanFingerprint

/** Plan-fingerprint stability (r17 directive 2). The r15 graph-tier
  * trigger fired on the driver's recorded ppr (5.40 s > 5.2) with
  * diff-identical code; the adjudication — host variance vs plan drift
  * — was a judgment call two rounds running. The committed bench
  * record now carries a canonical physical-plan hash per key, and this
  * spec re-derives the hash for the volatile tier (the graph family +
  * record_link + scd2_asof, the keys whose recorded times have
  * wobbled) from the CURRENT code against the SAME sf dir the record
  * names: match = any timing movement on these keys is host variance
  * by construction; mismatch = the plan actually drifted — either an
  * intended change (re-run the bench, refresh the round record) or the
  * regression the trigger exists to catch. */
class PlanFingerprintSpec extends SparkSpec {

  /** The keys whose round-over-round timings have needed adjudication
    * — the pin set the r16 verdict names. */
  private val pinned = Seq(
    "ppr", "pagerank", "pagerank_weighted", "record_link", "scd2_asof")

  test("the volatile tier's live plans match the committed bench record's fingerprints") {
    val dir = new java.io.File("bench")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("full_r\\d+\\.json"))
    assume(files.nonEmpty, "no committed bench record")
    val latest = files.maxBy(f =>
      f.getName.stripPrefix("full_r").stripSuffix(".json").toInt)
    val txt = scala.io.Source.fromFile(latest).mkString
    val plansLine = txt.linesIterator.find(_.startsWith("{\"plans\":"))
    assume(plansLine.nonEmpty,
      s"${latest.getName} predates plan fingerprints (r17)")
    val recorded = """"([a-z0-9_]+)":"([0-9a-f]{12}|err)"""".r
      .findAllMatchIn(plansLine.get)
      .map(m => m.group(1) -> m.group(2)).toMap
    val sfDir = """"sf":"([^"]+)"""".r.findFirstMatchIn(txt).get.group(1)
    assume(new java.io.File(sfDir).isDirectory,
      s"recorded sf dir $sfDir not present on this host")

    pinned.foreach { key =>
      // the bench records the TIMED plan — fnFor resolves benchOverride
      // first — while this spec derives from queries(). Identical today
      // because no pinned key is overridden; if one gains an override,
      // its fingerprint must be derived via the override (which needs
      // benchSetup state this spec cannot build) — fail with guidance
      // rather than misreporting permanent "drift" (review wave 2, r17)
      assert(!SparkEntry.benchOverride.contains(key),
        s"$key is benchOverride-timed: derive its live fingerprint from " +
          "the override plan (needs bench setup state) before pinning it " +
          "here, or unpin it")
      assert(recorded.contains(key), s"record carries no fingerprint for $key")
      assert(recorded(key) != "err",
        s"recorded fingerprint for $key is 'err' — the bench run could " +
          "not plan it; re-run the bench")
      val live = PlanFingerprint.of(SparkEntry.queries(key)(spark, sfDir))
      assert(live === recorded(key),
        s"plan drift on $key: live fingerprint $live != recorded " +
          s"${recorded(key)} in ${latest.getName}. If the change is " +
          "intended, re-run the min-of-3 bench and refresh the round " +
          "record; if not, this is the regression the graph-tier " +
          "trigger exists to catch")
    }
  }

  test("the fingerprint is insensitive to scale and session noise, sensitive to structure") {
    import org.apache.spark.sql.functions._
    // same plan at two scale factors → same hash (digits normalized)
    val q = (d: String) => Tables.lineitem(spark, d)
      .filter(col("l_quantity") > 10)
      .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s"))
    val small = PlanFingerprint.of(q("/root/testdata/sf0.001"))
    val big = PlanFingerprint.of(q(sf))
    assert(small === big, "scale factor must not move the fingerprint")
    // a structural change (an added filter) must move it
    val changed = PlanFingerprint.of(
      Tables.lineitem(spark, sf)
        .filter(col("l_quantity") > 10 && col("l_discount") > 0)
        .groupBy(col("l_returnflag")).agg(sum(col("l_quantity")).as("s")))
    assert(changed !== big, "a structural plan change must move the fingerprint")
  }
}
