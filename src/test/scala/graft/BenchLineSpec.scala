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

  test("per-query detail survives the tail window for the current query set") {
    // worst case (9999.99 s/query, a sub-3h run) must fit by 0 dp at the
    // latest — the totals-only fallback dropping per-query data is never
    // acceptable; and at realistic widths (< 1000 s/query) at least 1-dp
    // precision must fit (the round-11 decision recorded at
    // Bench.MaxLineLen: the gated set outgrew the 2-dp name budget, and
    // per-query 1 dp + 2-dp total beats capping the gated query set)
    val zeroDp = Bench.jsonLine(names, worst, sf, dp = 0, maxLen = Int.MaxValue)
    assert(zeroDp.length <= Bench.MaxLineLen,
      s"0-dp worst-case line is ${zeroDp.length} chars; shorten new query names")
    val realistic = names.map(_ -> 999.94).toMap // widest sub-1000s 1-dp value ("999.9")
    val oneDp = Bench.jsonLine(names, realistic, sf, dp = 1, maxLen = Int.MaxValue)
    assert(oneDp.length <= Bench.MaxLineLen,
      s"realistic 1-dp line is ${oneDp.length} chars; shorten new query names")
  }

  test("degradation keeps the emitted line within budget and parseable-shaped") {
    val line = Bench.jsonLine(names, worst, sf, dp = 2)
    assert(line.length <= Bench.MaxLineLen)
    assert(line.startsWith("""{"metric":"total","value":"""))
    assert(line.endsWith(s""","sf":"$sf"}"""))
    // every query key present unless the totals-only fallback fired
    assert(names.forall(n => line.contains("\"" + n + "\":")))
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
}
