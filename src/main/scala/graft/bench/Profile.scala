package graft.bench

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** The graph-tier profiled pass (r17 directive 2, owed since the r15
  * ppr trigger fired): runs the volatile keys once at the target SF
  * with a stage listener and prints each key's wall time, plan
  * fingerprint, and the stage-time breakdown (summed task executor
  * run time per stage, slowest first) — the artifact SURVEY §7k pins
  * the expected stage structure against. Run:
  * `SPARK_GRAFT_SF_DIR=... runMain graft.bench.Profile [keys...]` */
object Profile {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val keys = if (args.nonEmpty) args.toSeq
      else Seq("ppr", "pagerank_weighted", "record_link", "scd2_asof")
    val unknown = keys.filterNot(graft.SparkEntry.queries.contains)
    require(unknown.isEmpty,
      s"unknown keys: ${unknown.mkString(", ")} — valid keys are " +
        graft.SparkEntry.queries.keys.toSeq.sorted.mkString(", "))
    // the bench record fingerprints the TIMED plan (benchOverride
    // wins); this main runs queries() and has no benchSetup state, so
    // an overridden key's printed fingerprint would structurally
    // disagree with the record on identical code — refuse rather than
    // misreport drift (the PlanFingerprintSpec guard, applied here)
    val overridden = keys.filter(graft.SparkEntry.benchOverride.contains)
    require(overridden.isEmpty,
      s"keys ${overridden.mkString(", ")} are benchOverride-timed — " +
        "their recorded fingerprints come from the override plan, which " +
        "needs bench setup state this profiler does not build")
    def run(k: String, dir: String): Unit =
      graft.SparkEntry.queries(k)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    keys.foreach(k =>
      try run(k, "/root/testdata/sf0.001") catch { case _: Throwable => () })
    for (k <- keys) {
      val buf = new java.util.concurrent.ConcurrentLinkedQueue[
        (Int, String, Long, Long, Long, Int)]()
      val l = new SparkListener {
        override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
          val si = e.stageInfo
          val tm = si.taskMetrics
          buf.add((si.stageId, si.name.linesIterator.next().take(70),
            tm.executorRunTime, tm.shuffleWriteMetrics.bytesWritten,
            tm.inputMetrics.bytesRead, si.numTasks))
        }
      }
      spark.sparkContext.addSparkListener(l)
      val t0 = System.nanoTime()
      run(k, sfDir)
      val wall = (System.nanoTime() - t0) / 1e9
      Thread.sleep(1000) // listener bus drain
      spark.sparkContext.removeSparkListener(l)
      val fp = try PlanFingerprint.of(graft.SparkEntry.queries(k)(spark, sfDir))
      catch { case _: Throwable => "err" }
      println(f"PROFILE $k wall=$wall%.2f s stages=${buf.size} fingerprint=$fp")
      import scala.jdk.CollectionConverters._
      buf.asScala.toSeq.sortBy(-_._3).take(12).foreach {
        case (id, name, runMs, sw, in, nt) =>
          println(f"PROFILE   stage=$id%-5d cpu=${runMs / 1000.0}%8.2f s " +
            f"tasks=$nt%-4d input=${in / 1048576.0}%8.1f MiB " +
            f"shufW=${sw / 1048576.0}%8.1f MiB  $name")
      }
    }
    spark.stop()
  }
}
