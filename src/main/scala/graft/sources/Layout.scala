package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, Row}

/** G16: data-skipping layout — range-sorted parquet writes.
  *
  * At 100 TB the cheapest filter is the one that never reads the data.
  * Parquet keeps per-row-group min/max statistics in the footer; a scan
  * whose pushed predicate excludes a row group's range skips it without
  * touching a page. That only pays off if the layout gives each row
  * group a NARROW range of the filter column — which is exactly what
  * `repartitionByRange` + `sortWithinPartitions` produces: globally
  * range-partitioned files, each covering a disjoint slice of the key.
  *
  * The same layout compounds with partition-level pruning
  * (`Sources.writePartitioned` for coarse categorical keys like day or
  * lang) — directory pruning first, then row-group skipping inside the
  * surviving partitions. LayoutSpec measures the effect: an identical
  * selective filter reads the full table on a shuffled layout and only
  * the matching slice on the range-sorted one.
  *
  * `maxRecordsPerFile` bounds file size so a 1000-executor cluster gets
  * even task splits; one row group per file keeps the skipping unit and
  * the scheduling unit aligned.
  */
object Layout {
  def writeRangeSorted(df: DataFrame, path: String, numFiles: Int,
                       sortCols: Seq[String],
                       maxRecordsPerFile: Long = 0L): Unit = {
    import org.apache.spark.sql.functions.col
    val cols = sortCols.map(col)
    val w = df.repartitionByRange(numFiles, cols: _*)
      .sortWithinPartitions(cols: _*)
      .write.mode("overwrite")
    (if (maxRecordsPerFile > 0)
      w.option("maxRecordsPerFile", maxRecordsPerFile)
    else w).parquet(path)
  }

  /** Rows the parquet reader actually produced for `df`'s scan(s) during
    * the last action — row groups pruned by footer stats never count.
    * Diagnostic for layout tuning (used by LayoutSpec). */
  def scanOutputRows(df: Dataset[Row]): Long = {
    import org.apache.spark.sql.execution.FileSourceScanExec
    import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
    val plan = df.queryExecution.executedPlan match {
      case a: AdaptiveSparkPlanExec => a.executedPlan
      case p => p
    }
    plan.collect {
      case s: FileSourceScanExec => s.metrics("numOutputRows").value
    }.sum
  }
}
