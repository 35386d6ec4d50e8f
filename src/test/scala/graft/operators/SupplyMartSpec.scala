package graft.operators

import graft.{SparkSpec, Tables}
import graft.registry.Incremental
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

class SupplyMartSpec extends SparkSpec {
  import spark.implicits._

  private def li: DataFrame = Tables.lineitem(spark, sf)

  private def tmp(tag: String): String =
    java.nio.file.Files.createTempDirectory(s"graft-mart-$tag").toString + "/mart"

  private def rows(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("l_partkey", "l_suppkey", "cost_c", "value_c")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSet

  test("3 incremental refreshes over a shipdate split == one full compute, byte-identical", graft.Slow) {
    val full = tmp("full")
    val split = tmp("split")
    assert(SupplyMart.refresh(spark, li, full).touched > 0)

    // three ingestion-ordered chunks by shipdate tercile (the mart's
    // watermark column); boundaries derived from the data so the spec
    // holds at any SF
    val bounds = li.select(unix_micros(col("l_shipdate").cast("timestamp")).as("us"))
      .stat.approxQuantile("us", Array(0.33, 0.66), 0.0).map(_.toLong)
    val chunks = Seq(
      li.filter(unix_micros(col("l_shipdate").cast("timestamp")) <= bounds(0)),
      li.filter(unix_micros(col("l_shipdate").cast("timestamp")) > bounds(0) &&
        unix_micros(col("l_shipdate").cast("timestamp")) <= bounds(1)),
      li.filter(unix_micros(col("l_shipdate").cast("timestamp")) > bounds(1)))
    chunks.foreach { c => SupplyMart.refresh(spark, c, split): Unit }
    assert(rows(SupplyMart.read(spark, full)) ===
      rows(SupplyMart.read(spark, split)))

    // idempotence: nothing past the watermark -> zero buckets touched
    assert(SupplyMart.refresh(spark, li, split).touched === 0)
  }

  test("q2/q9/q11/q16 from the mart are row-identical to the gated inline forms") {
    val mart = tmp("twin")
    SupplyMart.refresh(spark, li, mart)
    val supply = SupplyMart.read(spark, mart)
    val pairs = Seq(
      ("q2", ShapeQueries4.q2MinCost(spark, sf),
        ShapeQueries4.q2MinCostFrom(spark, sf, supply)),
      ("q9", ShapeQueries4.q9Profit(spark, sf),
        ShapeQueries4.q9ProfitFrom(spark, sf, supply)),
      ("q11", ShapeQueries4.q11Important(spark, sf),
        ShapeQueries4.q11ImportantFrom(spark, sf, supply)),
      ("q16", ShapeQueries4.q16SupplierCnt(spark, sf),
        ShapeQueries4.q16SupplierCntFrom(spark, sf, supply)))
    pairs.foreach { case (name, inline, mat) =>
      assert(inline.schema === mat.schema, s"$name schemas diverged")
      assert(inline.collect().toSeq === mat.collect().toSeq,
        s"$name mart form diverged from inline")
    }
  }

  test("plan audit: mart-fed q2/q11/q16 never scan the fact table; q9 scans it exactly once") {
    val mart = tmp("plan")
    SupplyMart.refresh(spark, li, mart)
    val supply = SupplyMart.read(spark, mart)
    def scanCount(df: DataFrame, token: String): Int =
      df.queryExecution.executedPlan.toString.split("\n")
        .count(l => l.contains("FileScan parquet") && l.contains(token))
    Seq(
      "q2" -> ShapeQueries4.q2MinCostFrom(spark, sf, supply),
      "q11" -> ShapeQueries4.q11ImportantFrom(spark, sf, supply),
      "q16" -> ShapeQueries4.q16SupplierCntFrom(spark, sf, supply))
      .foreach { case (name, df) =>
        assert(scanCount(df, "lineitem") === 0,
          s"$name mart form still scans lineitem")
        assert(scanCount(df, "graft-mart") >= 1,
          s"$name mart form does not scan the mart")
      }
    val q9 = ShapeQueries4.q9ProfitFrom(spark, sf, supply)
    assert(scanCount(q9, "lineitem") === 1,
      "mart-fed q9 must scan the fact exactly once")
    assert(scanCount(q9, "graft-mart") >= 1)
  }

  test("refresh only rewrites touched buckets; watermark skips stale rows; lock refuses a second writer", graft.Slow) {
    val mart = tmp("delta")
    val early = li.filter(year(col("l_shipdate")) <= 1995)
    val late = li.filter(year(col("l_shipdate")) > 1995)
    assert(early.count() > 0 && late.count() > 0, "split degenerate at this SF")
    SupplyMart.refresh(spark, early, mart)
    val wm1 = Incremental.watermark(spark, mart)

    // a second refresh with ONLY already-watermarked rows is a no-op
    assert(SupplyMart.refresh(spark, early, mart).touched === 0)

    // fold in the late rows; mart == full compute over the union
    SupplyMart.refresh(spark, late, mart)
    assert(Incremental.watermark(spark, mart) > wm1)
    val fullDirect = tmp("direct")
    SupplyMart.refresh(spark, li, fullDirect)
    assert(rows(SupplyMart.read(spark, mart)) ===
      rows(SupplyMart.read(spark, fullDirect)))

    // single-writer: a held lock fails the refresh loudly
    val lock = new java.io.File(mart, "_lock_refresh")
    assert(lock.createNewFile())
    val ex = intercept[IllegalStateException] {
      SupplyMart.refresh(spark, li, mart)
    }
    assert(ex.getMessage.contains("supply-mart refresh"))
    assert(lock.delete())
  }

  test("crash between snapshot commit and watermark advance: retry does not double value_c", graft.Slow) {
    // the r14 review seam, mart flavor: SUM(value_c) would silently
    // double on a replayed delta without the per-partition effective
    // watermark. Simulate the crash window by rewinding the global
    // watermark after a completed refresh and refreshing again.
    val mart = tmp("crash")
    val early = li.filter(year(col("l_shipdate")) <= 1995)
    SupplyMart.refresh(spark, early, mart)
    val wmEarly = Incremental.watermark(spark, mart)
    SupplyMart.refresh(spark, li, mart)
    val settled = rows(SupplyMart.read(spark, mart))
    Incremental.writeWatermark(spark, mart, wmEarly) // the crash window
    SupplyMart.refresh(spark, li, mart)              // the retry
    assert(rows(SupplyMart.read(spark, mart)) === settled,
      "retry after a watermark-rewind crash double-counted partials")
  }

  test("a pre-existing meta pins the layout even when no data was ever written") {
    // meta-first ordering: a crash after the meta write but before the
    // first snapshot write must pin every retry to the recorded count
    val mart = tmp("metafirst")
    new java.io.File(mart).mkdirs()
    val w = new java.io.FileWriter(s"$mart/_mart_meta.json")
    w.write("""{"buckets":5}"""); w.close()
    SupplyMart.refresh(spark, li, mart, buckets = 64)
    val bucketDirs = new java.io.File(mart).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toLong)
    assert(bucketDirs.nonEmpty && bucketDirs.forall(_ < 5),
      s"retry ignored the recorded layout: ${bucketDirs.toSeq.sorted}")
  }

  test("a torn _mart_meta.json refuses loudly instead of splitting the layout") {
    val mart = tmp("tornmeta")
    new java.io.File(mart).mkdirs()
    // truncated tail of {"buckets":64} — a bare digit-run regex would
    // read this as 6 and route the same key into two bucket layouts
    val w = new java.io.FileWriter(s"$mart/_mart_meta.json")
    w.write("""{"buckets":6"""); w.close()
    val e = intercept[IllegalStateException] {
      SupplyMart.refresh(spark, li, mart, buckets = 64)
    }
    assert(e.getMessage.contains("_mart_meta"),
      s"refusal must name the torn file: ${e.getMessage}")
    // lock must not leak from the refusal — a corrected meta refreshes
    val w2 = new java.io.FileWriter(s"$mart/_mart_meta.json")
    w2.write("""{"buckets":64}"""); w2.close()
    assert(SupplyMart.refresh(spark, li, mart).touched > 0)
  }

  test("q9FromMartGate recovers from a killed run's scratch debris (stale lock, stale mart)") {
    // review-wave finding: the gate's persistent scratch dir wedged on
    // a `_lock_refresh` left by a killed run (the correctness gate
    // went permanently red from a transient kill) and could serve a
    // stale mart against a regenerated corpus — it now rebuilds fresh
    val rows1 = SupplyMart.q9FromMartGate(spark, sf).collect().toSeq
    val root = new java.io.File(
      s"${System.getProperty("java.io.tmpdir")}/graft_q9_mart_" +
        sf.replaceAll("[^A-Za-z0-9]", "_"))
    new java.io.File(root, "mart").mkdirs()
    assert(new java.io.File(new java.io.File(root, "mart"),
      "_lock_refresh").createNewFile())
    val rows2 = SupplyMart.q9FromMartGate(spark, sf).collect().toSeq
    assert(rows1 === rows2, "gate is not deterministic across reruns")
  }

  test("bucket count is pinned by the first publish (layout consistency across refreshes)") {
    val mart = tmp("buckets")
    val early = li.filter(year(col("l_shipdate")) <= 1995)
    SupplyMart.refresh(spark, early, mart, buckets = 8)
    // a later refresh REQUESTING a different count must keep using the
    // recorded 8 — same key must never land in two bucket partitions
    SupplyMart.refresh(spark, li, mart, buckets = 64)
    val bucketDirs = new java.io.File(mart).listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("bucket="))
      .map(_.getName.stripPrefix("bucket=").toLong)
    assert(bucketDirs.nonEmpty && bucketDirs.forall(_ < 8),
      s"refresh escaped the recorded bucket layout: ${bucketDirs.toSeq.sorted}")
    val fullDirect = tmp("direct8")
    SupplyMart.refresh(spark, li, fullDirect, buckets = 8)
    assert(rows(SupplyMart.read(spark, mart)) ===
      rows(SupplyMart.read(spark, fullDirect)))
  }
}
