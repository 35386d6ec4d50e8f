package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection tool: `runMain graft.Explain <query> [sfDir]` prints the
  * formatted physical plan for one SparkEntry query — used to audit
  * pushdown (PushedFilters/ReadSchema), WholeStageCodegen spans and
  * join/exchange placement after every operator change. */
object Explain {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    SparkEntry.queries(name)(spark, sfDir).explain("formatted")
    spark.stop()
  }
}
