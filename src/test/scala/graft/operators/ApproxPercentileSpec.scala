package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** B25 guard: the scale-safe percentile path must stay within its
  * advertised rank error of the exact target — measured on the REAL
  * events table, not synthetic data. approx_percentile(accuracy=10⁴)
  * guarantees |rank(returned) − p·n| ≤ n/10⁴ per the Greenwald-Khanna
  * bound; approx_count_distinct defaults to rsd 5%. The exact form
  * (agg_percentiles, B11) stays the oracle; this spec is what licenses
  * swapping it for the sketch at 100× where per-group value buffering
  * would OOM.
  */
class ApproxPercentileSpec extends SparkSpec {

  test("approx percentile rank error is within n/accuracy on real events") {
    val approx = ExtendedQueries.aggPercentilesApprox(spark, sf).collect()
    assert(approx.nonEmpty)
    val events = Tables.events(spark, sf).select("event_type", "value")
      .localCheckpoint(true)
    for (row <- approx) {
      val et = row.getString(0)
      val n = row.getLong(5)
      val vals = events.filter(col("event_type") === et)
      for ((p, i) <- Seq((0.5, 1), (0.9, 2), (0.99, 3))) {
        val v = row.getDouble(i)
        // rank of the returned value in the group; GK admits any value
        // whose rank is within n·(1/accuracy) of ceil(p·n)
        val r = vals.filter(col("value") <= v).count().toDouble
        val slack = n / 10000.0 + 1 // +1: the discrete step at the target
        assert(math.abs(r - p * n) <= slack,
          s"$et p$p: returned $v has rank $r, target ${p * n} ± $slack (n=$n)")
      }
    }
  }

  test("approx distinct users tracks the exact count within the rsd envelope") {
    val approx = ExtendedQueries.aggPercentilesApprox(spark, sf)
      .select("event_type", "n_users_approx").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.events(spark, sf)
      .groupBy(col("event_type")).agg(countDistinct(col("user_id")).as("u"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(approx.keySet == exact.keySet)
    for ((et, e) <- exact) {
      val a = approx(et)
      // 3σ of the default rsd=0.05 HLL++; generous but non-vacuous
      assert(math.abs(a - e).toDouble / e <= 0.15,
        s"$et: approx $a vs exact $e exceeds 15%")
    }
  }
}
