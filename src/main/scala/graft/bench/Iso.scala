package graft.bench

import org.apache.spark.sql.SparkSession

/** Isolated per-key timing (optimization-round harness): runs the named
  * keys alone — warmup at sf0.001, then `SPARK_GRAFT_ISO_PASSES`
  * (default 3) timed noop-sink passes at the target SF — and prints
  * min/median seconds per key, so a candidate optimization is measured
  * without the 141-plan sweep's cross-query GC/JIT billing (the same
  * reason Bench itself is min-of-3). With `SPARK_GRAFT_ISO_PLANDIR`
  * set, also writes each key's `.explain("formatted")` output to
  * `<dir>/<key>.txt` — the before/after plan artifacts the round
  * commits under plans/.
  *
  * Run: `SPARK_GRAFT_SF_DIR=... SPARK_GRAFT_CPUS=32
  *   runMain graft.bench.Iso <key> [key...]` */
object Iso {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: Iso <key> [key...]")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val passes = sys.env.getOrElse("SPARK_GRAFT_ISO_PASSES", "3").trim.toInt
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = args.toSeq
    val unknown = keys.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty, s"unknown keys: ${unknown.mkString(", ")}")
    // time the same body the bench times (benchOverride wins, its
    // setup runs untimed first) so Iso numbers compare to sweep numbers
    keys.foreach(k => graft.SparkEntry.benchSetup.get(k)
      .foreach(s => s(spark, sfDir)))
    def fnFor(k: String) =
      graft.SparkEntry.benchOverride.getOrElse(k, graft.SparkEntry.queries(k))
    def run(k: String, dir: String): Unit =
      fnFor(k)(spark, dir).write.format("noop").mode("overwrite").save()
    keys.foreach(k =>
      try run(k, "/root/testdata/sf0.001") catch { case _: Throwable => () })
    sys.env.get("SPARK_GRAFT_ISO_PLANDIR").foreach { dirS =>
      val dir = java.nio.file.Paths.get(dirS)
      java.nio.file.Files.createDirectories(dir): Unit
      keys.foreach { k =>
        val df = fnFor(k)(spark, sfDir)
        val txt = df.queryExecution.explainString(
          org.apache.spark.sql.execution.FormattedMode)
        java.nio.file.Files.writeString(dir.resolve(s"$k.txt"), txt): Unit
      }
    }
    for (k <- keys) {
      val ts = (1 to passes).map { _ =>
        System.gc()
        val t0 = System.nanoTime()
        run(k, sfDir)
        (System.nanoTime() - t0) / 1e9
      }.sorted
      println(f"ISO $k%-24s min=${ts.head}%8.3f  med=${ts(ts.size / 2)}%8.3f  all=${ts.map(t => f"$t%.3f").mkString(",")}")
    }
    spark.stop()
  }
}
