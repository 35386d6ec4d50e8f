package graft.registry

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class IncrementalSpec extends SparkSpec {
  private def tmpDir(): String =
    java.nio.file.Files.createTempDirectory("graft-incr").toString

  private def sortedRows(path: String): Seq[String] =
    Incremental.read(spark, path)
      .orderBy("user_id", "day")
      .collect().map(_.toString).toSeq

  test("three incremental refreshes == one full compute, byte-identical") {
    val events = Tables.events(spark, sf)
    // Split the log into thirds by time — each refresh sees strictly
    // newer data, like an ingestion-ordered log.
    val bounds = events
      .agg(expr("percentile(unix_micros(ts), array(0.33, 0.66))")).head()
      .getSeq[Double](0)
    val (t1, t2) = (bounds(0).toLong, bounds(1).toLong)

    val incrPath = tmpDir()
    Seq(
      events.filter(unix_micros(col("ts")) <= t1),
      events.filter(unix_micros(col("ts")) > t1 && unix_micros(col("ts")) <= t2),
      events.filter(unix_micros(col("ts")) > t2)
    ).foreach { chunk => Incremental.refresh(spark, chunk, incrPath) }

    val fullPath = tmpDir()
    Incremental.full(spark, events, fullPath)

    val inc = sortedRows(incrPath)
    val ful = sortedRows(fullPath)
    assert(inc.nonEmpty)
    assert(inc == ful)
    assert(Incremental.watermark(spark, incrPath) ==
      Incremental.watermark(spark, fullPath))
  }

  test("crash between snapshot commit and watermark advance: retry does not double-count") {
    // the r14 review seam: a crash AFTER the dynamic-overwrite commit
    // but BEFORE writeWatermark leaves committed day partitions beside
    // a stale watermark; a naive retry re-merges the same delta and
    // SUM partials double. Simulate by rewinding the watermark file to
    // its pre-refresh value and refreshing again with the same log.
    val events = Tables.events(spark, sf)
    val bound = events.agg(expr("percentile(unix_micros(ts), 0.5)"))
      .head().getDouble(0).toLong
    val p = tmpDir()
    Incremental.refresh(spark, events.filter(unix_micros(col("ts")) <= bound), p)
    val wmEarly = Incremental.watermark(spark, p)
    Incremental.refresh(spark, events, p)
    val settled = sortedRows(p)
    Incremental.writeWatermark(spark, p, wmEarly) // the crash window
    Incremental.refresh(spark, events, p)         // the retry
    assert(sortedRows(p) === settled,
      "retry after a watermark-rewind crash changed committed state")
  }

  test("partial commit: retry re-derives the unlanded partition and sheds replays for the landed ones") {
    // the harder crash shape: dynamic partition overwrite landed SOME
    // touched day partitions and not others before the crash. The
    // per-partition guard must admit the unlanded day's delta rows
    // (its stored max is still the EARLY state's) while shedding the
    // replay for every landed day. Simulate by restoring one touched
    // day's pre-refresh content after the full refresh + rewind.
    val events = Tables.events(spark, sf)
    val bound = events.agg(expr("percentile(unix_micros(ts), 0.5)"))
      .head().getDouble(0).toLong
    val early = events.filter(unix_micros(col("ts")) <= bound)
    val late = events.filter(unix_micros(col("ts")) > bound)
    // a day with rows on BOTH sides of the cut — the boundary day —
    // so its early-state partition content is a real partial state
    val day = early.select(date_format(col("ts"), "yyyy-MM-dd").as("d"))
      .intersect(late.select(date_format(col("ts"), "yyyy-MM-dd").as("d")))
      .orderBy("d").limit(1).collect().headOption.map(_.getString(0))
      .getOrElse(fail("no boundary day at this SF — split degenerate"))

    val p = tmpDir()
    Incremental.refresh(spark, early, p)
    val wmEarly = Incremental.watermark(spark, p)
    // snapshot the early state of the boundary day's partition
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(p).getFileSystem(conf)
    val dayDir = new org.apache.hadoop.fs.Path(s"$p/day=$day")
    val backup = new org.apache.hadoop.fs.Path(s"${tmpDir()}/day=$day")
    assert(fs.exists(dayDir), s"boundary day $day missing from early snapshot")
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, dayDir, fs, backup, false, conf))

    Incremental.refresh(spark, late, p)
    val settled = sortedRows(p)
    // crash simulation: watermark never advanced AND day=D's overwrite
    // never landed (its early content restored verbatim)
    Incremental.writeWatermark(spark, p, wmEarly)
    fs.delete(dayDir, true)
    assert(org.apache.hadoop.fs.FileUtil.copy(fs, backup, fs, dayDir, false, conf))
    assert(sortedRows(p) !== settled, "partial-commit simulation is vacuous")

    Incremental.refresh(spark, events, p) // the retry
    assert(sortedRows(p) === settled,
      "retry did not converge: unlanded partition under-derived or landed ones double-counted")
  }

  test("watermark pushdown: the global-mark filter sits BELOW the pmax join, on the raw side") {
    // plan pin for the r14 regression-that-happened: folding ts > wm
    // into greatest() behind the per-partition-max join kept it from
    // sinking below the join, and every refresh re-scanned the whole
    // raw log. Pin the shape, not the comment.
    val events = Tables.events(spark, sf)
    val bound = events.agg(expr("percentile(unix_micros(ts), 0.5)"))
      .head().getDouble(0).toLong
    val p = tmpDir()
    Incremental.refresh(spark, events.filter(unix_micros(col("ts")) <= bound), p)
    val wm = Incremental.watermark(spark, p)
    val pastWm = events.filter(unix_micros(col("ts")) > wm)
    val fresh = IncrementalProtocol.freshFrame(spark, pastWm, p, "day",
      date_format(col("ts"), "yyyy-MM-dd"), unix_micros(col("ts")),
      "max_ts_us", snapExists = true)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
    val plan = fresh.queryExecution.optimizedPlan
    val join = plan.collectFirst { case j: Join => j }
      .getOrElse(fail(s"no pmax join in the fresh plan:\n$plan"))
    def hasWmFilter(side: LogicalPlan): Boolean = side.collectFirst {
      case f: Filter if f.condition.toString.contains("unix_micros") &&
        f.condition.toString.contains(">") => f
    }.isDefined
    assert(hasWmFilter(join.left),
      s"global watermark filter not below the pmax join on the raw side:\n$plan")
  }

  test("refresh with no new data is a no-op") {
    val events = Tables.events(spark, sf)
    val p = tmpDir()
    assert(Incremental.refresh(spark, events, p).touched > 0)
    val before = sortedRows(p)
    assert(Incremental.refresh(spark, events, p).touched == 0) // all below watermark
    assert(sortedRows(p) == before)
  }

  test("watermark swap is a single overwrite rename: the file always holds a value") {
    val p = tmpDir()
    Incremental.writeWatermark(spark, p, 7L)
    assert(Incremental.watermark(spark, p) == 7L)
    // advancing over an EXISTING watermark must go through the
    // rename-with-OVERWRITE path (no delete window) and land the new value
    Incremental.writeWatermark(spark, p, 42L)
    assert(Incremental.watermark(spark, p) == 42L)
    // no tmp residue: the swap consumed the temp file
    assert(!new java.io.File(s"$p/_watermark.tmp").exists())
  }

  test("untouched day partitions are not rewritten") {
    val events = Tables.events(spark, sf)
    val p = tmpDir()
    // Load everything except the max day, then refresh with just that day.
    val maxDay = events.agg(max(date_format(col("ts"), "yyyy-MM-dd"))).head().getString(0)
    Incremental.refresh(spark,
      events.filter(date_format(col("ts"), "yyyy-MM-dd") < maxDay), p)

    val someOldDay = new java.io.File(p).listFiles()
      .filter(f => f.getName.startsWith("day=") && !f.getName.endsWith(maxDay))
      .minBy(_.getName)
    val filesBefore = someOldDay.listFiles().map(_.getName).sorted.toSeq

    val touched = Incremental.refresh(spark,
      events.filter(date_format(col("ts"), "yyyy-MM-dd") === maxDay), p)
    assert(touched.touched >= 1)
    assert(someOldDay.listFiles().map(_.getName).sorted.toSeq == filesBefore)
  }
}
