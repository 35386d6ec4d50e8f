package graft.bench

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.window.WindowExec

/** Pins the `WindowExec: No Partition Defined` warnings to queries
  * (r18 verdict item 9): plans every declared query at the given SF
  * and reports each one whose physical plan contains a Window with an
  * EMPTY partition spec — the single-partition shape the warning is
  * about. Analytical only (nothing executes). Run:
  * `runMain graft.bench.WindowAudit [sfDir]` */
object WindowAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def globals(p: SparkPlan): Seq[WindowExec] = {
      val here = p.collect {
        case w: WindowExec if w.partitionSpec.isEmpty => Seq(w)
        case a: AdaptiveSparkPlanExec => globals(a.executedPlan)
      }.flatten
      here
    }
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      try {
        val ws = globals(fn(spark, sfDir).queryExecution.executedPlan)
        if (ws.nonEmpty) println(s"WINDOWAUDIT $name: ${ws.size} global " +
          s"window(s): ${ws.map(_.windowExpression.mkString(",").take(80))}")
      } catch { case e: Throwable =>
        println(s"WINDOWAUDIT $name: plan failed: ${e.getMessage.take(80)}")
      }
    }
    println("WINDOWAUDIT done")
    spark.stop()
  }
}
