package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Typed loaders for the driver-generated TPC-H-ish parquet tables.
  *
  * All queries read through here so scans stay prunable: callers select
  * columns immediately and Catalyst pushes projection/filters into the
  * parquet reader (verify via `.explain`: `ReadSchema` / `PushedFilters`).
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")

  /** `documents` spread across the cores by doc_id BEFORE heavy
    * row-local text work (r18): the corpus can arrive as one parquet
    * row group (the driver testdata does), which makes every scan a
    * single task and serializes tokenize/n-gram/regex pipelines
    * (guide §2.5 — "one huge unsplittable file ... repartition
    * immediately after the read"). One narrow (doc_id, text, …)
    * exchange buys full-width parallelism; the width is explicit so
    * AQE cannot coalesce the tiny-at-test-scale shuffle back to one
    * task. Operators whose downstream work is trivial keep the plain
    * loader — the exchange is not free. */
  def documentsSpread(s: SparkSession, d: String): DataFrame =
    spreadByKey(documents(s, d), "doc_id")

  /** Keyed spread GATED on observed scan width (r19). The repartition
    * cures the one-row-group testdata pathology (a single-task scan
    * serializing heavy row-local work), but at production scale the
    * table is thousands of splits and the scan is already wide — an
    * unconditional keyed exchange would then move the whole corpus for
    * nothing. `df.rdd.getNumPartitions` is planning-only (no job runs);
    * when the source already yields at least half the cores' worth of
    * partitions, the spread is skipped. Semantics-free either way
    * (keyed repartition only relocates rows). */
  def spreadByKey(df: DataFrame, keys: String*): DataFrame = {
    val npart =
      math.max(1, df.sparkSession.sparkContext.defaultParallelism)
    if (df.rdd.getNumPartitions * 2 >= npart) df
    else df.repartition(npart,
      keys.map(org.apache.spark.sql.functions.col): _*)
  }
  /** `events.ts` has shipped as parquet TIMESTAMP(NANOS) (Spark 4
    * refuses to map it to TimestampType — read as a raw long via the
    * legacy conf and truncate to microseconds) and, in later testdata
    * generations, as TIMESTAMP_NTZ micros (wall time, no zone — cast to
    * an instant). Both conversions treat the stored wall time as UTC,
    * matching DuckDB's naive-timestamp `epoch_us` in the oracles; every
    * entry point (Verify/Bench/Stress/tests) pins
    * `spark.sql.session.timeZone=UTC` so the NTZ cast is
    * deployment-independent. */
  def events(s: SparkSession, d: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = load(s, d, "events")
    df.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
          org.apache.spark.sql.functions.expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        df.withColumn("ts", org.apache.spark.sql.functions.col("ts")
          .cast(org.apache.spark.sql.types.TimestampType))
      case _ => df   // already a proper timestamp (e.g. re-written copies)
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
