package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

class SkewOpsSpec extends SparkSpec {
  test("salted aggregation matches direct groupBy exactly (counts)") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id")).agg(count(lit(1)).as("n"))
    val salted = SkewOps.saltedCountSum(ev, "user_id", "value", salts = 8)
      .select("user_id", "n")
    assert(direct.except(salted).count() === 0)
    assert(salted.except(direct).count() === 0)
  }

  test("salted sum matches direct within fp tolerance") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy(col("user_id")).agg(sum(col("value")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedCountSum(ev, "user_id", "value", salts = 8)
      .collect().map(r => r.getLong(0) -> r.getDouble(2)).toMap
    assert(direct.keySet === salted.keySet)
    direct.foreach { case (k, v) =>
      assert(math.abs(v - salted(k)) < 1e-6 * math.max(1.0, math.abs(v)))
    }
  }
}
