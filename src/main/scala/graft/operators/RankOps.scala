package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed replacements for empty-partitionBy window ranks.
  *
  * `Window.orderBy(...)` with no partitionBy pulls the entire input
  * through ONE task — fine on a laptop, fatal at 100 TB. Both operators
  * here produce bit-identical results to the corresponding global window
  * function while keeping every stage partitioned:
  *
  *  - [[percentRankByCounts]]: percent_rank(v) = (# rows with value < v)
  *    / (n - 1). Counting is a keyed aggregation; the only sequential
  *    structure needed is a prefix sum over value BANDS, whose
  *    cardinality is bounded (≤ maxBands), collected to the driver like
  *    AQE collects stage statistics.
  *  - [[twoPhaseRowNumber]]: range-repartition on the sort key, number
  *    rows within each partition, then offset by the preceding
  *    partitions' counts (driver-collected P-sized list). Equivalent to
  *    row_number() over a global sort — and to rank()/dense_rank() when
  *    the sort key is unique, the common case of ranking a keyed
  *    aggregate with an id tie-break.
  */
object RankOps {

  /** Append `outCol` = percent_rank of `valueCol` (ascending, global)
    * computed by count arithmetic. `valueCol` must be numeric. NULL
    * values rank first (all peers → percent_rank 0.0), matching
    * `percent_rank() OVER (ORDER BY v)` nulls-first semantics; non-null
    * ranks are offset by the null count. */
  def percentRankByCounts(df: DataFrame, valueCol: String, outCol: String,
      maxBands: Int = 1024): DataFrame = {
    val v = col(valueCol)
    // one row per distinct value — the only data the rank math needs
    val perValue = df.filter(v.isNotNull).groupBy(v.as("_rv")).agg(count(lit(1)).as("_rcnt"))
    val statsRow = df.agg(min(v).cast("double"), max(v).cast("double"),
      count(lit(1)), count(v)).collect()(0)
    if (statsRow.getLong(2) == 0) return df.withColumn(outCol, lit(0.0))
    val n = statsRow.getLong(2)
    val nNulls = n - statsRow.getLong(3)
    if (nNulls == n) return df.withColumn(outCol, lit(0.0)) // all-null: one peer group
    val (mn, mx) = (statsRow.getDouble(0), statsRow.getDouble(1))
    val width = math.max((mx - mn) / maxBands, java.lang.Double.MIN_NORMAL)
    val bandOf = least(floor((col("_rv").cast("double") - lit(mn)) / lit(width)),
      lit(maxBands - 1)).cast("long")
    val banded = perValue.withColumn("_rband", bandOf)
    // prefix-sum the band totals on the driver: ≤ maxBands rows, the
    // same driver-side role as AQE's per-stage row counts
    val totals = banded.groupBy(col("_rband")).agg(sum(col("_rcnt")).as("_rtot"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toSeq
    val offsetsDf = df.sparkSession.createDataFrame(offsets).toDF("_rband", "_roff")
    val wInBand = Window.partitionBy(col("_rband")).orderBy(col("_rv"))
    val cntLess = banded
      .join(broadcast(offsetsDf), Seq("_rband"))
      .withColumn("_rcum", sum(col("_rcnt")).over(wInBand) - col("_rcnt"))
      .select(col("_rv"), (col("_roff") + col("_rcum")).as("_rless"))
    val pct = if (n <= 1) lit(0.0)
              else (col("_rless") + lit(nNulls)).cast("double") / lit((n - 1).toDouble)
    val ranked = df.filter(v.isNotNull).join(cntLess, v === col("_rv"))
      .withColumn(outCol, pct)
      .drop("_rv", "_rless")
    if (nNulls == 0) ranked
    else ranked.unionByName(df.filter(v.isNull).withColumn(outCol, lit(0.0)))
  }

  /** Append `outCol` = EXCLUSIVE prefix sum of `valueCol` (must be a
    * non-null integral column) over a global sort by `sortCols` —
    * i.e. for each row, the sum of `valueCol` over all strictly
    * preceding rows. Same two-phase shape as [[twoPhaseRowNumber]]:
    * range-repartition on the sort key, window-sum WITHIN each
    * partition, then offset by the preceding partitions' totals (a
    * driver-collected P-sized list, broadcast back). Bit-identical to
    * `sum(v) OVER (ORDER BY k ROWS BETWEEN UNBOUNDED PRECEDING AND 1
    * PRECEDING)` without the single-partition global window. */
  def exclusivePrefixSum(df: DataFrame, valueCol: String, outCol: String,
      numPartitions: Int, sortCols: Column*): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("_ppid", spark_partition_id())
      .localCheckpoint(true)
    val totals = ranged.groupBy(col("_ppid"))
      .agg(sum(col(valueCol)).as("_pt"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = totals.map(_._1)
      .zip(totals.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toSeq
    val offsetsDf = df.sparkSession.createDataFrame(offsets).toDF("_ppid", "_poff")
    val wInPart = Window.partitionBy(col("_ppid")).orderBy(sortCols: _*)
    ranged
      .join(broadcast(offsetsDf), Seq("_ppid"))
      .withColumn(outCol,
        col("_poff") + sum(col(valueCol)).over(wInPart) - col(valueCol))
      .drop("_ppid", "_poff")
  }

  /** Append `outCol` = row_number over a global sort by `sortCols`,
    * without a global single-partition sort: range-repartition, number
    * within partitions, add per-partition offsets. The input is
    * materialized once (eager localCheckpoint) so the range boundaries
    * sampled for the count job and the output job are identical — and,
    * unlike `persist()`, the blocks are NOT pinned in the CacheManager:
    * the ContextCleaner reclaims them once the frame is unreferenced, so
    * repeated calls (e.g. bench loops) don't accumulate cached copies. */
  def twoPhaseRowNumber(df: DataFrame, outCol: String, numPartitions: Int,
      sortCols: Column*): DataFrame = {
    val ranged = df.repartitionByRange(numPartitions, sortCols: _*)
      .withColumn("_rpid", spark_partition_id())
      .localCheckpoint(true)
    val counts = ranged.groupBy(col("_rpid")).agg(count(lit(1)).as("_rc"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).dropRight(1)).toSeq
    val offsetsDf = df.sparkSession.createDataFrame(offsets).toDF("_rpid", "_roff")
    val wInPart = Window.partitionBy(col("_rpid")).orderBy(sortCols: _*)
    ranged
      .join(broadcast(offsetsDf), Seq("_rpid"))
      .withColumn(outCol, (col("_roff") + row_number().over(wInPart)).cast("int"))
      .drop("_rpid", "_roff")
  }
}
