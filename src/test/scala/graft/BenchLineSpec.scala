package graft

import org.scalatest.funsuite.AnyFunSuite

/** Guards the driver-tail-window fit of Bench's JSON line (the driver
  * keeps only the last 2000 chars of stdout; round 3's full-precision
  * 67-query line overflowed it and the round's bench numbers were
  * lost). Uses worst-case value widths so a green spec means the real
  * line always fits regardless of measured times. */
class BenchLineSpec extends AnyFunSuite {
  private val names = SparkEntry.queries.keys.toSeq
  // worst plausible per-query time: four integer digits (sub-3h run)
  private val worst = names.map(_ -> 9999.994).toMap
  private val sf = "/root/testdata/sf0.1"

  test("per-query detail for the slowest queries survives the tail window") {
    // the 83-query set no longer fits full detail at ANY precision
    // (the MaxLineLen SECOND DECISION): the emitted line must fit the
    // window, keep 1-dp detail for a substantial slowest prefix, and
    // account for the omitted tail explicitly — the totals-only
    // fallback must stay unreachable even at worst-case value widths
    val line = Bench.jsonLine(names, worst, sf, dp = 2)
    assert(line.length <= Bench.MaxLineLen)
    assert(!line.contains("queries_dropped"),
      "totals-only fallback fired — per-query signal lost")
    val detailed = names.count(n => line.contains("\"" + n + "\":"))
    assert(detailed >= names.size / 2,
      s"only $detailed of ${names.size} queries kept detail at worst-case widths")
    if (detailed < names.size)
      assert(line.contains("\"queries_omitted\":") &&
        line.contains("\"omitted_sec\":"),
        s"omission unmarked: $line")
  }

  test("omission is slowest-first: the outliers always keep their values") {
    // one dominant outlier among uniform fast queries: the outlier's
    // key must survive every degradation, and the omitted set must be
    // drawn from the fast tail only
    val skewed = names.zipWithIndex.map { case (n, i) =>
      n -> (if (i == 7) 1234.5 else 0.31 + (i % 7) * 0.1) }.toMap
    val line = Bench.jsonLine(names, skewed, sf, dp = 2)
    assert(line.length <= Bench.MaxLineLen)
    val outlier = names(7)
    assert(line.contains("\"" + outlier + "\":1234.5"),
      s"slowest query's detail lost: $line")
    // total remains auditable: detailed values + omitted_sec ≈ total
    if (line.contains("queries_omitted")) {
      val om = "\"omitted_sec\":([0-9.]+)".r.findFirstMatchIn(line).get.group(1).toDouble
      val det = "\"[a-z0-9_]+\":([0-9]+\\.[0-9])[,}]".r
        .findAllMatchIn(line.substring(line.indexOf("queries"))).map(_.group(1).toDouble).sum
      val total = names.map(skewed).sum
      assert(math.abs(det + om - total) < 0.1 * names.size,
        s"detail $det + omitted $om far from total $total")
    }
  }

  test("degradation keeps the emitted line within budget and parseable-shaped") {
    val line = Bench.jsonLine(names, worst, sf, dp = 2)
    assert(line.length <= Bench.MaxLineLen)
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(s""","sf":"$sf"}"""))
    // a small name set still gets full detail with no omission marker
    val few = names.take(10)
    val fewLine = Bench.jsonLine(few, worst, sf, dp = 2)
    assert(few.forall(n => fewLine.contains("\"" + n + "\":")))
    assert(!fewLine.contains("queries_omitted") && !fewLine.contains("queries_dropped"))
  }

  test("oracle coverage: every query has an oracle or a documented rows-only waiver") {
    val q = SparkEntry.queries.keySet
    val o = SparkEntry.oracleSql.keySet
    assert(o.subsetOf(q), s"oracle without query: ${o.diff(q)}")
    // the waiver set is exact in BOTH directions: an undocumented gap
    // fails, and a stale waiver (query gained an oracle or was removed)
    // also fails rather than silently over-waiving
    assert(q.diff(o) == SparkEntry.rowsOnlyQueries,
      s"oracle gaps ${q.diff(o)} != documented rows-only waivers ${SparkEntry.rowsOnlyQueries}")
    assert(SparkEntry.rowsOnlyQueries.intersect(o).isEmpty,
      s"waived queries that DO have oracles: ${SparkEntry.rowsOnlyQueries.intersect(o)}")
  }

  test("bench setup/override maps: equal keys, every key a gated query") {
    // the composite-key split (r15 directive 3): an override without
    // its setup would time a cold build; a setup without an override
    // would build state nothing reads
    assert(SparkEntry.benchSetup.keySet === SparkEntry.benchOverride.keySet)
    assert(SparkEntry.benchOverride.keySet.subsetOf(SparkEntry.queries.keySet),
      "bench override for a key that is not a gated query")
  }

  test("the committed per-round bench record covers every gated query") {
    // r15 directive 6: the driver's recorded artifact truncates to the
    // slowest ~90 keys; the in-repo bench/full_r<N>.json is the full
    // min-of-3 record. The LATEST committed round file must carry
    // exactly the current query set — after adding or removing a gated
    // query, re-run the min-of-3 bench and refresh the round file.
    val dir = new java.io.File("bench")
    val files = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.matches("full_r\\d+\\.json"))
    assert(files.nonEmpty,
      "no bench/full_r<N>.json committed — run graft.Bench with " +
        "SPARK_GRAFT_BENCH_OUT=bench/full_r<N>.json and commit it")
    val latest = files.maxBy(f =>
      f.getName.stripPrefix("full_r").stripSuffix(".json").toInt)
    val txt = scala.io.Source.fromFile(latest).mkString
    val keyRe = """"([a-z0-9_]+)":""".r
    val keys = keyRe.findAllMatchIn(txt).map(_.group(1)).toSet --
      Set("metric", "value", "unit", "queries", "sf", "plans")
    assert(keys === SparkEntry.queries.keySet,
      s"${latest.getName} is stale: missing " +
        s"${SparkEntry.queries.keySet.diff(keys)}, extra " +
        s"${keys.diff(SparkEntry.queries.keySet)} — re-run the bench " +
        "and refresh the round file")
  }
}
