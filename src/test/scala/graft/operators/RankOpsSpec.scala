package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** RankOps semantics vs the window forms they replace — including NULL
  * values, which percent_rank ranks first (one peer group at 0.0). */
class RankOpsSpec extends SparkSpec {
  import spark.implicits._

  test("percentRankByCounts matches percent_rank with NULLs present") {
    val df = Seq[(Int, Option[Int])](
      (1, Some(30)), (2, None), (3, Some(10)), (4, Some(20)),
      (5, None), (6, Some(10)), (7, Some(40))).toDF("id", "v")
    val expected = df
      .withColumn("pr", percent_rank().over(Window.orderBy(col("v"))))
      .select("id", "pr").as[(Int, Double)].collect().toMap
    val got = RankOps.percentRankByCounts(df, "v", "pr")
      .select("id", "pr").as[(Int, Double)].collect().toMap
    assert(got == expected)
  }

  test("percentRankByCounts on all-null and empty inputs") {
    val allNull = Seq[(Int, Option[Int])]((1, None), (2, None)).toDF("id", "v")
    assert(RankOps.percentRankByCounts(allNull, "v", "pr")
      .select("pr").as[Double].collect().toSeq == Seq(0.0, 0.0))
    val empty = Seq.empty[(Int, Option[Int])].toDF("id", "v")
    assert(RankOps.percentRankByCounts(empty, "v", "pr").count() == 0)
  }

  test("twoPhaseRowNumber does not pin blocks in the CacheManager") {
    val df = Seq((3, "c"), (1, "a"), (2, "b")).toDF("k", "s")
    val before = spark.sharedState.cacheManager.isEmpty
    val ranked = RankOps.twoPhaseRowNumber(df, "rn", 2, col("k"))
    assert(ranked.orderBy("rn").select("k").as[Int].collect().toSeq == Seq(1, 2, 3))
    // localCheckpoint materializes blocks but registers nothing with the
    // CacheManager — repeated bench runs cannot accumulate pinned plans
    assert(spark.sharedState.cacheManager.isEmpty == before)
  }
}
